"""Generate scenes/Models/terrain30k.obj — a deterministic ~30k-triangle
heightfield mesh for the scale benchmark (VERDICT r2 item 4: the
reference demonstrated a 30k-triangle room as "real-time",
/root/reference/slides/MS3.pdf p.6; the largest shipped scene here was
bunny's 4,968 world triangles).

A 123x123 vertex grid over [-1,1]^2 with layered sinusoidal height
(pure closed form — no RNG, so the OBJ is bit-reproducible) gives
122*122*2 = 29,768 triangles.

Usage: python scenes/gen_terrain30k.py   (writes next to itself)
"""
import math
import os

N = 123           # vertices per side -> (N-1)^2*2 = 29768 triangles


def height(x, z):
    """Layered ridges: enough vertical relief for real occlusion and
    normal variation, bounded to [-0.25, 0.25] before scene scaling."""
    h = (0.12 * math.sin(3.1 * x + 1.3) * math.cos(2.7 * z - 0.4)
         + 0.06 * math.sin(7.3 * x - 2.1 * z + 0.7)
         + 0.04 * math.cos(12.9 * x + 9.1 * z)
         + 0.02 * math.sin(23.0 * x - 17.0 * z + 2.2))
    return max(-0.25, min(0.25, h))


def main(path):
    lines = ["# terrain30k: deterministic heightfield, "
             f"{(N - 1) * (N - 1) * 2} triangles\n"]
    for i in range(N):
        z = -1.0 + 2.0 * i / (N - 1)
        for j in range(N):
            x = -1.0 + 2.0 * j / (N - 1)
            lines.append(f"v {x:.6f} {height(x, z):.6f} {z:.6f}\n")
    for i in range(N - 1):
        for j in range(N - 1):
            a = i * N + j + 1          # OBJ indices are 1-based
            b = a + 1
            c = a + N
            d = c + 1
            lines.append(f"f {a} {c} {b}\n")   # CCW seen from +y
            lines.append(f"f {b} {c} {d}\n")
    with open(path, "w") as f:
        f.writelines(lines)
    print(f"wrote {path}: {N * N} verts, {(N - 1) * (N - 1) * 2} tris")


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "Models", "terrain30k.obj")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    main(out)
