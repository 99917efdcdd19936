from ptdn_tpu.engine.renderer import Renderer  # noqa: F401
