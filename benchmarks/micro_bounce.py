import numpy as np, jax, jax.numpy as jnp
from ptdn_tpu.utils.timing import bench_slope
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.config import RenderConfig
from ptdn_tpu.engine import wavefront as WF
from ptdn_tpu.ops.pallas import bounce as BK
from ptdn_tpu.ops.pallas import shade as SH

scene = Scene(__import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path("cornell"))
cfg = RenderConfig(trace_depth=8, denoise_enable=True, backend="pallas")
ds = scene.device()
n = 800 * 800
nb = n // 128
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.normal(size=(BK.N_BIN, nb, 128)).astype(np.float32))
planes = planes.at[19].set(0.0)   # mat
planes = planes.at[20].set(1.0)   # active
pv = jnp.asarray(np.r_[np.zeros(3), 1.4, 2.7, 0.0, 1.0, 0.0].astype(np.float32))
fd = jnp.asarray([3], dtype=jnp.uint32)
mats = WF._static_mats(scene)

@jax.jit
def f(p):
    out = BK.bounce_fused_pallas(
        p, pv, fd, ds, mats=mats, shadow_ray=True, reduce_var=True,
        geom_types=scene.geom_types, geom_mats=scene.geom_material_ids,
        n_tris=scene.n_tris, light_geom=0, do_vis=True,
        light_emit=(5., 5., 5.), compat=True)
    nxt = jnp.concatenate([out[0:10], p[10:13], out[10:19]], axis=0)
    return nxt

ms = bench_slope(lambda p: f(p), planes, n1=4, n2=16,
                 chain=lambda out, a: (out,))
print(f"fused bounce kernel: {ms:7.2f} ms")

# old 3-kernel path for comparison: shade + vis + intersect
isect = WF.make_intersector(scene, cfg)
vis = WF.make_light_visibility(scene, cfg, 0)

@jax.jit
def g(p):
    out = SH.shade_bounce_pallas(p, pv[:8], fd, mats, True, True)
    o = jnp.stack([out[SH.O_SPX].reshape(n), out[SH.O_SPY].reshape(n),
                   out[SH.O_SPZ].reshape(n)], -1)
    d = jnp.stack([out[SH.O_DX].reshape(n), out[SH.O_DY].reshape(n),
                   out[SH.O_DZ].reshape(n)], -1)
    sd = jnp.stack([out[SH.O_SDX].reshape(n), out[SH.O_SDY].reshape(n),
                    out[SH.O_SDZ].reshape(n)], -1)
    lit = vis(ds, o, sd)
    nxt = isect(ds, o, d)
    r = out[SH.O_RR] + lit.reshape(nb, 128)
    p2 = p.at[6].set(nxt["t"].reshape(nb, 128)).at[16].set(r)
    return p2

ms = bench_slope(lambda p: g(p), planes, n1=4, n2=16,
                 chain=lambda out, a: (out,))
print(f"old 3-kernel bounce: {ms:7.2f} ms")

@jax.jit
def f2(p):
    out = BK.bounce_fused_pallas(
        p, pv, fd, ds, mats=mats, shadow_ray=True, reduce_var=True,
        geom_types=scene.geom_types, geom_mats=scene.geom_material_ids,
        n_tris=scene.n_tris, light_geom=0, do_vis=False,
        light_emit=(5., 5., 5.), compat=True)
    return jnp.concatenate([out[0:10], p[10:13], out[10:19]], axis=0)

ms = bench_slope(lambda p: f2(p), planes, n1=4, n2=16,
                 chain=lambda out, a: (out,))
print(f"fused, no vis inside: {ms:7.2f} ms")

@jax.jit
def g2(p):
    out = SH.shade_bounce_pallas(p, pv[:8], fd, mats, True, True)
    o = jnp.stack([out[SH.O_SPX].reshape(n), out[SH.O_SPY].reshape(n),
                   out[SH.O_SPZ].reshape(n)], -1)
    d = jnp.stack([out[SH.O_DX].reshape(n), out[SH.O_DY].reshape(n),
                   out[SH.O_DZ].reshape(n)], -1)
    nxt = isect(ds, o, d)
    p2 = p.at[6].set(nxt["t"].reshape(nb, 128))
    return p2

ms = bench_slope(lambda p: g2(p), planes, n1=4, n2=16,
                 chain=lambda out, a: (out,))
print(f"old shade+isect (no vis): {ms:7.2f} ms")
