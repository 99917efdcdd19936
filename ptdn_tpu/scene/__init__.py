from ptdn_tpu.scene.scene import Scene, DeviceScene  # noqa: F401
