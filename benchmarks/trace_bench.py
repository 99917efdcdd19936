import numpy as np, jax, jax.numpy as jnp
from ptdn_tpu.utils.timing import bench_slope
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.config import RenderConfig
from ptdn_tpu.engine import wavefront as WF

scene = Scene(__import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path("cornell"))
cfg = RenderConfig(trace_depth=8, denoise_enable=True, temporal_enable=True,
                   spatial_enable=True, atrous_nlevel=5, backend="pallas")
ds = scene.device()
n = 800 * 800
rng = np.random.default_rng(0)
o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.1)
d_ = rng.normal(size=(n, 3)).astype(np.float32)
d_ /= np.linalg.norm(d_, axis=1, keepdims=True)
d0 = jnp.asarray(d_)

isect = WF.make_intersector(scene, cfg)
vis = WF.make_light_visibility(scene, cfg, 0)

@jax.jit
def f_isect(o, d):
    out = isect(ds, o, d)
    return out, o + out["t"][:, None] * 1e-12

@jax.jit
def f_vis(o, d):
    lit = vis(ds, o, d)
    return lit, o + lit[:, None].astype(jnp.float32) * 1e-12

@jax.jit
def f_kernel_only(o, d):
    from ptdn_tpu.ops.pallas.scene_intersect import scene_intersect_pallas
    out = scene_intersect_pallas(ds, scene.geom_types, o, d, scene.n_tris)
    return out, o + out["t_a"][:, None] * 1e-12

ms = bench_slope(lambda o, d: f_isect(o, d), o, d0, n1=4, n2=16,
                 chain=lambda out, a: (out[1], a[1]))
print(f"full intersect (kernel+attr+merge): {ms:7.2f} ms")
ms = bench_slope(lambda o, d: f_kernel_only(o, d), o, d0, n1=4, n2=16,
                 chain=lambda out, a: (out[1], a[1]))
print(f"scene_intersect kernel only:        {ms:7.2f} ms")
ms = bench_slope(lambda o, d: f_vis(o, d), o, d0, n1=4, n2=16,
                 chain=lambda out, a: (out[1], a[1]))
print(f"light visibility kernel:            {ms:7.2f} ms")
