import sys

import numpy as np, jax, jax.numpy as jnp
from ptdn_tpu.utils.timing import bench_slope
from ptdn_tpu.denoise import reproject as RP

if len(sys.argv) > 1:
    w, h = (int(x) for x in sys.argv[1].split("x"))
else:
    h = w = 800
rng = np.random.default_rng(0)
def img(c=3):
    return jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
gb_c = {"position": img()*3, "normal": img(),
        "geom_id": jnp.asarray(rng.integers(0, 3, (h, w)).astype(np.int32))}
gb_p = {"position": img()*3, "normal": gb_c["normal"],
        "geom_id": gb_c["geom_id"]}
vm = np.eye(4, dtype=np.float32); vm[2, 2] = -1.0
color, ch = img(), img()
mh = img(2)
hl = jnp.asarray(rng.integers(0, 6, (h, w)).astype(np.int32))

def run(tag, fn):
    @jax.jit
    def f(color):
        out = fn((w, h), color, gb_c, gb_p, jnp.asarray(vm), ch, mh, hl,
                 jnp.float32(0.2), jnp.float32(0.2))
        return out[1]  # color_acc
    ms = bench_slope(lambda c: f(c), color, n1=4, n2=12,
                     chain=lambda out, a: (out,))
    print(f"{tag:36s} {ms:7.2f} ms")

run("packed (9 gathers)", RP.back_projection_packed)
run("packed2 (4 gathers)", RP.back_projection_packed2)
run("window (1 gather, strided build)", RP.back_projection_window)
run("stencil (no gathers; static cam)", RP.back_projection_stencil)
run("auto (cond dispatch)", RP.back_projection_auto)

# banded slab gather: time with LOCAL displacements (its gate), which is
# what makes the slab working set small. Build positions that reproject
# to (pixel + dy, pixel + dx) with |dy| <= margin.
ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
rng2 = np.random.default_rng(3)
dy = rng2.uniform(-14, 14, size=(h, w)).astype(np.float32)
dxl = rng2.uniform(-60, 60, size=(h, w)).astype(np.float32)
px = (xs + 0.5 + dxl).astype(np.float32)
py = (ys + 0.5 + dy).astype(np.float32)
z = -np.ones_like(px)
vx = -((px + 0.5) / w - 0.5) * 2.0
vy = -((py + 0.5) / h - 0.5) * 2.0
gb_local = dict(gb_c)
gb_local["position"] = jnp.asarray(np.stack([vx, vy, z], -1))

def run_local(tag, fn):
    @jax.jit
    def f(color):
        out = fn((w, h), color, gb_local, gb_p, jnp.asarray(vm), ch, mh,
                 hl, jnp.float32(0.2), jnp.float32(0.2))
        return out[1]
    ms = bench_slope(lambda c: f(c), color, n1=4, n2=12,
                     chain=lambda out, a: (out,))
    print(f"{tag:36s} {ms:7.2f} ms")

run_local("window  (local +-14px motion)", RP.back_projection_window)
run_local("banded  (local +-14px motion)", RP.back_projection_banded)

b1 = RP.back_projection_window((w, h), color, gb_local, gb_p,
                               jnp.asarray(vm), ch, mh, hl,
                               jnp.float32(0.2), jnp.float32(0.2))
b2 = RP.back_projection_banded((w, h), color, gb_local, gb_p,
                               jnp.asarray(vm), ch, mh, hl,
                               jnp.float32(0.2), jnp.float32(0.2))
for i, (x, y) in enumerate(zip(b1, b2)):
    d = float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
    print(f"banded parity out[{i}]: max|diff| = {d}")

# parity: stencil must equal window bit-for-bit when displacement <= 1.
# identity view matrix reprojects pos->screen arbitrarily; instead build
# positions whose reprojection IS the pixel center (displacement 0).
ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
px = (xs + 0.5).astype(np.float32)
py = (ys + 0.5).astype(np.float32)
# invert: prevx = (-(vx/vz)*0.5+0.5)*w - 0.5 with viewmat=I (vz=z)
z = -np.ones_like(px)          # view matrix has vm[2,2] = -1 -> vs_z = 1
vx = -((px + 0.5) / w - 0.5) * 2.0
vy = -((py + 0.5) / h - 0.5) * 2.0
gb_c2 = dict(gb_c)
gb_c2["position"] = jnp.asarray(np.stack([vx, vy, z], -1))
a1 = RP.back_projection_window((w, h), color, gb_c2, gb_p, jnp.asarray(vm),
                               ch, mh, hl, jnp.float32(0.2), jnp.float32(0.2))
a2 = RP.back_projection_stencil((w, h), color, gb_c2, gb_p, jnp.asarray(vm),
                                ch, mh, hl, jnp.float32(0.2), jnp.float32(0.2))
for i, (x, y) in enumerate(zip(a1, a2)):
    d = float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
    print(f"parity out[{i}]: max|diff| = {d}")
