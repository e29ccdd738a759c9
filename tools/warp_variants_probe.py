#!/usr/bin/env python
"""Head-to-head warp-gather strategies for the in-graph RandAugment
affine op (the dominant augment cost after the LUT/histogram fixes:
~123 ms/batch of the 134.5 total, tools/logs/augment_attrib2.log).

All variants compute the SAME PIL-parity bilinear warp (4 clamped taps,
truncate, fill outside); only the gather formulation differs:

  packed   — current: channels packed into one int32, 4 batched 2D
             advanced-index gathers (vmap over images)
  unpacked — pre-fix form: (S,S,3) f32 image, 4 advanced-index gathers
             of 3-vectors
  flat     — packed image raveled per image, taps via jnp.take on a 1D
             flat index (y*W+x), vmap over images
  gflat    — ONE global 1D take across the whole batch (image offset
             folded into the flat index) per tap
  window   — lax.gather with a (2,2) window: one gather per image
             fetching all 4 taps of a pixel together

Chained timing per CLAUDE.md (perturb coeffs via prev output).
Run: python tools/warp_variants_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = int(os.environ.get("ITERS", "8"))
B = int(os.environ.get("WB", "22"))
S = int(os.environ.get("WS", "224"))
N_STAGES = 2


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    img_np = rng.randint(0, 256, (B, S, S, 3)).astype(np.float32)
    # one rotate-ish affine per image
    coeffs_np = np.zeros((B, 6), np.float32)
    ang = rng.uniform(-0.3, 0.3, B)
    coeffs_np[:, 0] = np.cos(ang)
    coeffs_np[:, 1] = np.sin(ang)
    coeffs_np[:, 3] = -np.sin(ang)
    coeffs_np[:, 4] = np.cos(ang)
    coeffs_np[:, 2] = rng.uniform(-5, 5, B)
    coeffs_np[:, 5] = rng.uniform(-5, 5, B)

    imgs = jnp.asarray(img_np)
    coeffs0 = jnp.asarray(coeffs_np)

    def _coords(coeffs, H, W):
        a, b, c, d, e, f = [coeffs[i] for i in range(6)]
        ys, xs = jnp.mgrid[0:H, 0:W]
        xs = xs.astype(jnp.float32) + 0.5
        ys = ys.astype(jnp.float32) + 0.5
        xs0 = a * xs + b * ys + c
        ys0 = d * xs + e * ys + f
        inside = (xs0 >= 0) & (xs0 < W) & (ys0 >= 0) & (ys0 < H)
        xin = xs0 - 0.5
        yin = ys0 - 0.5
        x0 = jnp.floor(xin)
        y0 = jnp.floor(yin)
        fx = (xin - x0)[..., None]
        fy = (yin - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
        return inside, fx, fy, x0i, x1i, y0i, y1i

    def _mix(t00, t01, t10, t11, fx, fy, inside, fill=128.0):
        v = (t00 * (1 - fx) * (1 - fy) + t01 * fx * (1 - fy)
             + t10 * (1 - fx) * fy + t11 * fx * fy)
        v = jnp.clip(jnp.trunc(v), 0.0, 255.0)
        return jnp.where(inside[..., None], v, jnp.float32(fill))

    def _pack(img):
        pi = img.astype(jnp.int32)
        return pi[..., 0] | (pi[..., 1] << 8) | (pi[..., 2] << 16)

    def _unpack(g):
        return jnp.stack([g & 255, (g >> 8) & 255, (g >> 16) & 255],
                         axis=-1).astype(jnp.float32)

    def warp_packed(img, coeffs):
        H, W, _ = img.shape
        inside, fx, fy, x0i, x1i, y0i, y1i = _coords(coeffs, H, W)
        packed = _pack(img)
        return _mix(_unpack(packed[y0i, x0i]), _unpack(packed[y0i, x1i]),
                    _unpack(packed[y1i, x0i]), _unpack(packed[y1i, x1i]),
                    fx, fy, inside)

    def warp_unpacked(img, coeffs):
        H, W, _ = img.shape
        inside, fx, fy, x0i, x1i, y0i, y1i = _coords(coeffs, H, W)
        p = img.astype(jnp.float32)
        return _mix(p[y0i, x0i], p[y0i, x1i], p[y1i, x0i], p[y1i, x1i],
                    fx, fy, inside)

    def warp_flat(img, coeffs):
        H, W, _ = img.shape
        inside, fx, fy, x0i, x1i, y0i, y1i = _coords(coeffs, H, W)
        pf = _pack(img).ravel()

        def tap(yi, xi):
            return _unpack(jnp.take(pf, (yi * W + xi).ravel(),
                                    unique_indices=False).reshape(H, W))

        return _mix(tap(y0i, x0i), tap(y0i, x1i), tap(y1i, x0i),
                    tap(y1i, x1i), fx, fy, inside)

    def warp_window(img, coeffs):
        """lax.gather with a (2,2,3) window anchored at (y0, x0): all 4
        taps of a pixel in ONE gather."""
        H, W, _ = img.shape
        inside, fx, fy, x0i, x1i, y0i, y1i = _coords(coeffs, H, W)
        # window start clamped so the 2x2 fits; per-tap clamp is then
        # recovered by selecting: when x1i == x0i (edge), both columns
        # of the window hold x0i's value only if start==x0i-? — instead
        # gather at start=(min(y0i, H-2), min(x0i, W-2)) and pick taps
        # via the clamped offsets.
        ys = jnp.minimum(y0i, H - 2)
        xs = jnp.minimum(x0i, W - 2)
        starts = jnp.stack([ys, xs], axis=-1).reshape(-1, 2)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        win = lax.gather(img, starts, dn, slice_sizes=(2, 2, 3),
                         mode=lax.GatherScatterMode.CLIP)
        win = win.reshape(H, W, 2, 2, 3)
        oy0 = (y0i - ys)  # 0, or 0 when clamped (y0i==H-1 -> ys=H-2 -> 1)
        oy1 = (y1i - ys)
        ox0 = (x0i - xs)
        ox1 = (x1i - xs)

        def pick(oy, ox):
            oh_y = (oy[..., None] == jnp.arange(2)).astype(img.dtype)
            oh_x = (ox[..., None] == jnp.arange(2)).astype(img.dtype)
            return jnp.einsum("hwyxc,hwy,hwx->hwc", win, oh_y, oh_x)

        return _mix(pick(oy0, ox0), pick(oy0, ox1), pick(oy1, ox0),
                    pick(oy1, ox1), fx, fy, inside)

    def batched(warp_one):
        def run(imgs, coeffs):
            out = imgs
            for _ in range(N_STAGES):
                out = jax.vmap(warp_one)(out, coeffs)
            return out
        return run

    def warp_gflat(imgs_, coeffs):
        """One global 1D take across the batch per tap."""
        Bn, H, W, _ = imgs_.shape
        inside, fx, fy, x0i, x1i, y0i, y1i = jax.vmap(
            lambda c: _coords(c, H, W))(coeffs)
        pf = jax.vmap(_pack)(imgs_).ravel()
        base = (jnp.arange(Bn, dtype=jnp.int32) * (H * W))[:, None, None]

        def tap(yi, xi):
            idx = (base + yi * W + xi).ravel()
            return _unpack(jnp.take(pf, idx).reshape(Bn, H, W))

        return _mix(tap(y0i, x0i), tap(y0i, x1i), tap(y1i, x0i),
                    tap(y1i, x1i), fx, fy, inside)

    def gflat_run(imgs, coeffs):
        out = imgs
        for _ in range(N_STAGES):
            out = warp_gflat(out, coeffs)
        return out

    VARIANTS = [
        ("packed", batched(warp_packed)),
        ("unpacked", batched(warp_unpacked)),
        ("flat", batched(warp_flat)),
        ("gflat", gflat_run),
        ("window", batched(warp_window)),
    ]

    ref = None
    for name, fn in VARIANTS:
        run = jax.jit(lambda im, co, fn=fn: fn(im, co))
        t0 = time.time()
        out = run(imgs, coeffs0)
        o = np.asarray(out[:, ::64, ::64, 0])
        compile_s = time.time() - t0
        if ref is None:
            ref = np.asarray(out)
            match = "ref"
        else:
            match = ("EXACT" if np.array_equal(np.asarray(out), ref)
                     else "MISMATCH")
        # chain: perturb coeffs by a value derived from the output
        def chained(out, co=coeffs0):
            return co + (out[0, 0, 0, 0] * 0).astype(co.dtype)

        out = run(imgs, chained(out))
        np.asarray(out[:1, 0, 0, 0])
        t0 = time.time()
        for _ in range(ITERS):
            out = run(imgs, chained(out))
        np.asarray(out[:1, 0, 0, 0])
        dt = (time.time() - t0) / ITERS
        print(f"warp {name}: {dt * 1e3:.1f} ms/batch(B{B}x{N_STAGES}st) "
              f"parity={match} compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
