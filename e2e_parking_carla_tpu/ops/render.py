"""Fused Pallas surround-camera renderer.

The pure-JAX renderer (sim/camera.py) scans over 64 vehicle boxes with the
per-pixel nearest-hit carry living in HBM — ~64 round trips over megabytes
of carry per frame, HBM-bound. This kernel fuses the whole render per pixel
tile in VMEM:

* one grid cell = (env, pixel tile); a pixel tile is one AZIMUTH SECTOR of
  one camera (the image is laid out column-major per sector so each tile is
  a contiguous block of columns),
* boxes are pre-culled per (env, camera, sector) by exact conservative
  azimuth-overlap + distance tests (host-side static sector spans, a masked
  top_k outside the kernel), so interior tiles pay for the 2-4 boxes that
  can actually intersect them instead of every vehicle in the lot,
* the box loop runs inside the kernel with the nearest-hit state in
  registers/VMEM — the carry never leaves the chip,
* all pose-independent per-pixel quantities — ground-hit distance, sky
  elevation, the vehicle-height z-slab — come from the SAME host-precomputed
  static tables the pure renderer consumes (sim/camera.py:
  static_ray_tables), which removes per-frame divisions/rsqrts AND keeps the
  two implementations bit-identical,
* ground slot-line markings are computed analytically (the same closed form
  as sim/camera.py: 4 row lines + 16 slot-center lines), no texture gathers.

Outputs match render_cameras() bit-for-bit (bench.py enforces this on
hardware with culling disabled).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_parking_carla_tpu.config import SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim import camera as cam_lib

LANES = 128
BOX_FIELDS = 5  # cx, cy, cos, sin, color-code (palette index, -1 = invalid)
ENV_FIELDS = 16
SECTORS = 8  # azimuth sectors (column bands) per camera


@functools.lru_cache(maxsize=4)
def _static_tables(sim_cfg: SimConfig, n_sectors: int = SECTORS):
    """Sector-ordered static pixel planes + per-sector azimuth spans.

    Pixel order is (camera, sector, row, col-within-sector) so one pallas
    tile = one sector. Returns (planes dict of (rows, 128) f32, az_center
    (4, S), az_half (4, S), origins (4, 3))."""
    tab = cam_lib.static_ray_tables(sim_cfg)
    N, H, W = tab["dx"].shape
    Ws = W // n_sectors
    assert W % n_sectors == 0 and (H * Ws) % LANES == 0

    def sectorize(a):
        # (N, H, W) -> (N, S, H, Ws) -> (rows, LANES)
        a = a.reshape(N, H, n_sectors, Ws).transpose(0, 2, 1, 3)
        return np.ascontiguousarray(a).reshape(-1, LANES).astype(np.float32)

    # camera origins are constant per camera (the rig is rigid): they enter
    # the kernel as per-tile SMEM scalars, not per-pixel planes — the world
    # rotation owx = ox*c - oy*s + ex is then one scalar op per tile instead
    # of two 4 B/px plane reads + a per-pixel vector rotation (bit-identical:
    # same IEEE ops on the same values, matching render_cameras' per-camera
    # scalar origin math)
    org = tab["origins"]
    planes = {k: sectorize(tab[k]) for k in ("dx", "dy", "tg", "elev", "zn", "zf")}
    # sky gradient as two fma planes: sky = hor*(1-e) + sky_rgb*e with
    # hor = sky_rgb*0.8 + 0.18 collapses to sky_rgb*(0.8 + 0.2e) +
    # 0.18*(1-e) — one fma per pixel-channel against static planes instead
    # of the 4-op blend. The pure renderer (sim/camera.py) computes the
    # SAME factored expression with the same f32 ops, so bit-parity holds.
    planes["elev_a"] = sectorize(0.8 + 0.2 * tab["elev"])
    planes["elev_b"] = sectorize(0.18 * (1.0 - tab["elev"]))

    # exact horizontal azimuth span of each sector (vehicle frame, radians):
    # circular center + max deviation over the sector's pixels
    az = np.arctan2(tab["dy"].astype(np.float64), tab["dx"].astype(np.float64))
    az = az.reshape(N, H, n_sectors, Ws).transpose(0, 2, 1, 3)
    center = np.arctan2(np.sin(az).mean(axis=(2, 3)), np.cos(az).mean(axis=(2, 3)))
    dev = az - center[:, :, None, None]
    dev = (dev + np.pi) % (2 * np.pi) - np.pi
    half = np.abs(dev).max(axis=(2, 3))

    # ---- per-tile-row ELEVATION-BAND statics ----
    # A box hit can only affect the output at ray params t inside
    # [max(zn, 0), min(zf, tg)] (enter the vehicle z-slab, in front of the
    # ground hit — hits beyond tg are overwritten by ground in the
    # composite). Convert to HORIZONTAL metres (t * |d_xy|, the same measure
    # as the XY-circle cull distances) and aggregate per tile row: a
    # candidate at horizontal distance d can appear in a row iff
    # [d - r_box, d + r_box] overlaps the row's [lo, hi]. Rows of pure sky /
    # steep ground get empty windows, so whole elevation bands of the image
    # statically cull their box loop (VERDICT r2 item 5).
    norm_xy = np.sqrt(tab["dx"].astype(np.float64) ** 2
                      + tab["dy"].astype(np.float64) ** 2)
    wlo = np.maximum(tab["zn"], 0.0) * norm_xy
    whi = np.minimum(tab["zf"], tab["tg"]) * norm_xy
    wvalid = (tab["zf"] > 0.0) & (whi > wlo)
    wlo = np.where(wvalid, wlo, np.inf)
    whi = np.where(wvalid, whi, -np.inf)
    n_tiles = N * n_sectors
    row_lo = sectorize(wlo).reshape(n_tiles, -1, LANES).min(axis=2)
    row_hi = sectorize(whi).reshape(n_tiles, -1, LANES).max(axis=2)
    sky_row = (sectorize(tab["tg"]).reshape(n_tiles, -1, LANES)
               >= cam_lib.SKY_DEPTH).all(axis=2)
    bands = {"row_lo": row_lo.astype(np.float32),
             "row_hi": row_hi.astype(np.float32), "sky_row": sky_row}
    return (planes, center.astype(np.float32), half.astype(np.float32),
            org.astype(np.float32), bands)


def _tree_min(vals):
    """Balanced-tree minimum. fp min is exact (no rounding), so this is
    bit-identical to a sequential chain while cutting the dependent-op
    depth from len(vals)-1 to ceil(log2(len(vals))) — the VPU dual-issues
    the independent pairs (round-4: the 15-deep slot-center chain was the
    longest dependency in the ground path)."""
    vals = list(vals)
    while len(vals) > 1:
        nxt = [jnp.minimum(a, b) for a, b in zip(vals[::2], vals[1::2])]
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def _line_intensity(px, py):
    """Analytic slot-line marking (mirrors cam_lib.ground_line_intensity,
    unrolled over the static row/slot coordinates)."""
    hl, hw = 2.75, 1.55
    w = cam_lib.LINE_HALF_WIDTH
    dx_row = _tree_min(jnp.abs(px - rx) for rx in scene_lib.ROW_X.tolist())
    dy_slot = _tree_min(jnp.abs(py - sy) for sy in scene_lib.SLOT_Y.tolist())
    on_x = (jnp.abs(dx_row - hl) < w) & (dy_slot < hw + w)
    on_y = (jnp.abs(dy_slot - hw) < w) & (dx_row < hl + w)
    return jnp.where(on_x | on_y, 1.0, 0.0)


def _make_kernel(sim_cfg: SimConfig, n_boxes: int, n_bands: int = 1,
                 packed: bool = True, env_chunk: int = 1,
                 box_switch: str = "single", skip_sky: bool = True,
                 unroll_envs: bool = False, debug_zero: tuple = ()):
    """n_bands > 1: each (camera, sector) tile is split into `n_bands`
    elevation bands (contiguous tile-row blocks); kmax_ref then holds a
    packed 4-bit per-band candidate count and skyband_ref a static all-sky
    flag per (tile, band) — bands whose static z-slab window excludes every
    candidate skip the box loop, all-sky bands skip the ground math too.

    env_chunk > 1: one grid cell renders the band for `env_chunk`
    consecutive envs in an in-kernel loop. The hardware attribution
    (tools/profile_render.py) shows the per-grid-cell fixed cost (window
    swaps, per-env SMEM DMAs, scalar setup) dominating the per-pixel VPU
    math at chunk 1; chunking amortizes that fixed cost across envs while
    the static pixel planes stay resident in VMEM. At chunk 32 the cost
    decomposes as ~13.7 us/env-step floor (ground+sky+pack+writes+glue) +
    ~1.8 us per unrolled box body (v5e, tools round-4 attribution)."""
    hl = float(sim_cfg.npc_half_length)
    hw = float(sim_cfg.npc_half_width)
    sl = float(sim_cfg.slot_half_length)
    sw = float(sim_cfg.slot_half_width)
    SKY = cam_lib.SKY_DEPTH
    eps = 1e-8

    def kernel(env_ref, boxes_ref, pal_ref, kmax_ref, skyband_ref, org_ref,
               dx_ref, dy_ref, tg_ref, ea_ref, eb_ref, zn_ref, zf_ref,
               *out_refs):
        tb = pl.program_id(0)
        t = tb // n_bands if n_bands > 1 else tb
        # static pixel planes: read once per cell, reused for every env in
        # the chunk
        dxv = dx_ref[:]
        dyv = dy_ref[:]
        tg = tg_ref[:]
        n2 = zn_ref[:]
        f2 = zf_ref[:]
        # scalar vehicle-frame camera origin (constant over the tile)
        ox_t = org_ref[2 * t]
        oy_t = org_ref[2 * t + 1]
        sky_band_flag = skyband_ref[tb]

        def _render_one(i, ground_on):
            # per-env SMEM operands are blocked by the env grid axis (window
            # = env_chunk rows): a full (E, .) SMEM window overflows the
            # 1 MB SMEM at fleet sizes (E=1024 boxes alone is 2 MB)
            ex = env_ref[i, 0, 0]
            ey = env_ref[i, 0, 1]
            c = env_ref[i, 0, 2]
            s = env_ref[i, 0, 3]
            tgx = env_ref[i, 0, 4]
            tgy = env_ref[i, 0, 5]
            bright = env_ref[i, 0, 6]
            sky_r = env_ref[i, 0, 7]
            sky_g = env_ref[i, 0, 8]
            sky_b = env_ref[i, 0, 9]

            dwx = dxv * c - dyv * s
            dwy = dxv * s + dyv * c
            # world-frame camera origin (scalar per env)
            owx = ox_t * c - oy_t * s + ex
            owy = ox_t * s + oy_t * c + ey

            # hoist every scalar SMEM load out of the occupancy-switch
            # branches: the scalar core can then run ahead of the vector
            # work instead of serializing loads behind each lax.cond entry
            hoist = n_boxes <= 16
            if hoist:
                pre = []
                for k in range(n_boxes):
                    base = t * (n_boxes * BOX_FIELDS) + k * BOX_FIELDS
                    code_k = boxes_ref[i, 0, base + 4]
                    ci_k = jnp.maximum(code_k, 0.0).astype(jnp.int32)
                    pre.append((
                        boxes_ref[i, 0, base + 0], boxes_ref[i, 0, base + 1],
                        boxes_ref[i, 0, base + 2], boxes_ref[i, 0, base + 3],
                        code_k, pal_ref[ci_k * 3 + 0], pal_ref[ci_k * 3 + 1],
                        pal_ref[ci_k * 3 + 2]))

            def body(k, carry):
                t_best, vr, vg, vb = carry
                if hoist and isinstance(k, int):
                    cx, cy, cb, sb, code, col_r, col_g, col_b = pre[k]
                else:
                    base = t * (n_boxes * BOX_FIELDS) + k * BOX_FIELDS
                    cx = boxes_ref[i, 0, base + 0]
                    cy = boxes_ref[i, 0, base + 1]
                    cb = boxes_ref[i, 0, base + 2]
                    sb = boxes_ref[i, 0, base + 3]
                    code = boxes_ref[i, 0, base + 4]
                    ci = jnp.maximum(code, 0.0).astype(jnp.int32)
                    col_r = pal_ref[ci * 3 + 0]
                    col_g = pal_ref[ci * 3 + 1]
                    col_b = pal_ref[ci * 3 + 2]
                bvalid = code  # >= 0 iff valid

                relx = owx - cx
                rely = owy - cy
                o0 = relx * cb + rely * sb
                o1 = -relx * sb + rely * cb
                d0 = dwx * cb + dwy * sb
                d1 = -dwx * sb + dwy * cb

                def slab(o, d, half):
                    guarded = jnp.where(jnp.abs(d) < eps,
                                        jnp.where(d >= 0, eps, -eps), d)
                    inv = 1.0 / guarded
                    t1 = (-half - o) * inv
                    t2 = (half - o) * inv
                    return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

                n0, f0 = slab(o0, d0, hl)
                n1, f1 = slab(o1, d1, hw)
                tmin = jnp.maximum(n0, jnp.maximum(n1, n2))
                tmax = jnp.minimum(f0, jnp.minimum(f1, f2))
                hit = (bvalid >= 0.0) & (tmax >= tmin) & (tmax > 0) \
                    & (tmin > 0) & (tmin < t_best)
                # entry face -> lambert-ish (x faces 0.75, y 0.9, top 1.0)
                f_light = jnp.where(
                    n0 >= jnp.maximum(n1, n2), 0.75,
                    jnp.where(n1 >= n2, 0.9, 1.0))
                t_best = jnp.where(hit, tmin, t_best)
                vr = jnp.where(hit, col_r * f_light, vr)
                vg = jnp.where(hit, col_g * f_light, vg)
                vb = jnp.where(hit, col_b * f_light, vb)
                return t_best, vr, vg, vb

            shape = dxv.shape
            init = (jnp.full(shape, SKY, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32))

            def run_k(kk):
                # bit-exact at any kk >= the candidate count: extra
                # candidates are invalid (code < 0) and their body is a
                # no-op
                def f(_):
                    if kk <= 16:
                        # static unroll: Mosaic software-pipelines across
                        # boxes
                        carry = init
                        for k in range(kk):
                            carry = body(k, carry)
                        return carry
                    return jax.lax.fori_loop(0, kk, body, init)
                return f

            # occupancy switch: run only the k_here candidates the cull
            # kept for this (tile, band) — the hardware attribution shows
            # each unrolled box costs ~2.8 us/env-step while most bands
            # keep 0 or 1, so branching to the exact count reclaims most
            # of the box-loop time. Bit-exact (see run_k).
            if n_bands > 1:
                k_here = (kmax_ref[i, 0, t] >> (4 * (tb % n_bands))) & 15
            else:
                k_here = kmax_ref[i, 0, t]
            # box_switch picks the control-flow shape of the occupancy
            # switch (bit-exact in all modes — extra candidates are
            # invalid no-ops, see run_k). The hardware attribution at
            # env_chunk 32 shows VECTOR ops are nearly free while each
            # lax.cond costs pipeline bubbles (zeroing the 60-op slot-line
            # chain moves the bench < 0.3%, but dropping from 3 nested
            # conds to 1 saves ~24%) — hence "single"/"always".
            if box_switch == "always":
                t_box, vr, vg, vb = run_k(n_boxes)(None)
            elif box_switch == "single" or n_boxes > 4:
                t_box, vr, vg, vb = jax.lax.cond(
                    k_here > 0, run_k(n_boxes), run_k(0), None)
            else:
                def build(kk):
                    if kk == 0:
                        return run_k(0)
                    return lambda _: jax.lax.cond(
                        k_here >= kk, run_k(kk), build(kk - 1), None)
                t_box, vr, vg, vb = build(n_boxes)(None)

            # ---- ground shading (skipped on statically all-sky bands;
            # `ground_on` is a PYTHON bool — the sky_band_flag cond is
            # hoisted to ONE pl.when pair per grid cell, not one lax.cond
            # per env in the chunk) ----
            if ground_on and "ground" not in debug_zero:
                pgx = owx + tg * dwx
                pgy = owy + tg * dwy
                if "lines" in debug_zero:
                    line = jnp.zeros(shape, jnp.float32)
                else:
                    line = _line_intensity(pgx, pgy)
                in_t = (jnp.abs(pgx - tgx) <= sl) & (jnp.abs(pgy - tgy) <= sw)
                gray = 0.32 + 0.55 * line
                gr = jnp.where(in_t, gray * 0.4 + 0.55, gray)
                gg = jnp.where(in_t, gray * 0.4, gray)
                gb = jnp.where(in_t, gray * 0.4, gray)
                in_target = in_t
            else:
                z = jnp.zeros(shape, jnp.float32)
                gr, gg, gb = z, z, z
                in_target = jnp.zeros(shape, jnp.bool_)

            # ---- sky (two static fma planes, see _static_tables) ----
            ea = ea_ref[:]
            eb = eb_ref[:]
            sk_r = sky_r * ea + eb
            sk_g = sky_g * ea + eb
            sk_b = sky_b * ea + eb
            if "sky" in debug_zero:
                sk_r = sk_g = sk_b = jnp.zeros(shape, jnp.float32)

            # ---- composite ----
            box_front = t_box < tg
            t_hit = jnp.where(box_front, t_box, tg)
            is_sky = t_hit >= SKY

            out_r = jnp.where(is_sky, sk_r, jnp.where(box_front, vr, gr))
            out_g = jnp.where(is_sky, sk_g, jnp.where(box_front, vg, gg))
            out_b = jnp.where(is_sky, sk_b, jnp.where(box_front, vb, gb))
            si = jnp.where(
                is_sky, 0, jnp.where(box_front, 1, jnp.where(in_target, 2, 0)))
            if packed and "pack" in debug_zero:
                # attribution mode: keep every upstream value live (so
                # nothing above gets DCE'd) but skip the quantize/shift
                # chain — the delta to the default measures the pack cost.
                # `+ si` keeps the semantic-channel select chain live too;
                # without it the si where-chain is DCE'd and the measured
                # "pack cost" silently includes the composite.
                rgbs_ref, depth_ref = out_refs
                rgbs_ref[i] = (out_r + out_g + out_b).astype(jnp.int32) + si
                depth_ref[i] = jnp.minimum(t_hit, SKY)
            elif packed:
                # pack RGB (8-bit quantized, the reference's PNG precision)
                # + sem into ONE int32 plane: 8 B/px of HBM writes (with
                # depth) instead of the 20 B/px of five f32 planes — at the
                # cost of ~12 VPU ops/px of quantization (measured faster,
                # tools/bench_render_ab.py).
                rgbs_ref, depth_ref = out_refs
                ri = jnp.round(jnp.clip(out_r * bright, 0.0, 1.0)
                               * 255.0).astype(jnp.int32)
                gi = jnp.round(jnp.clip(out_g * bright, 0.0, 1.0)
                               * 255.0).astype(jnp.int32)
                bi = jnp.round(jnp.clip(out_b * bright, 0.0, 1.0)
                               * 255.0).astype(jnp.int32)
                rgbs_ref[i] = ri | (gi << 8) | (bi << 16) | (si << 24)
                depth_ref[i] = jnp.minimum(t_hit, SKY)
            else:
                # round-2 layout: raw f32 color planes (no quantization ops)
                r_ref, g_ref, b_ref, sem_ref, depth_ref = out_refs
                r_ref[i] = jnp.clip(out_r * bright, 0.0, 1.0)
                g_ref[i] = jnp.clip(out_g * bright, 0.0, 1.0)
                b_ref[i] = jnp.clip(out_b * bright, 0.0, 1.0)
                sem_ref[i] = si
                depth_ref[i] = jnp.minimum(t_hit, SKY)

        def run_all(ground_on):
            if env_chunk == 1:
                _render_one(0, ground_on)
            elif unroll_envs:
                # static unroll: Mosaic can software-pipeline the scalar
                # setup and window logic of env i+1 behind the vector work
                # of env i
                for i in range(env_chunk):
                    _render_one(i, ground_on)
            else:
                def env_body(i, _):
                    _render_one(i, ground_on)
                    return 0
                jax.lax.fori_loop(0, env_chunk, env_body, 0)

        if skip_sky:
            # sky_band_flag is constant over the cell: ONE predicated pair
            # per grid cell replaces the per-env ground lax.cond (at
            # env_chunk 32 that is 32 conds -> 1; bit-exact — same math,
            # the flag==1 branch produced zeros for every env before too)
            @pl.when(sky_band_flag == 0)
            def _():
                run_all(True)

            @pl.when(sky_band_flag != 0)
            def _():
                run_all(False)
        else:
            # branch-free: all-sky bands waste (free) vector ops but skip
            # the predication; composite overwrites ground with sky there
            run_all(True)

    return kernel


def unpack_rgb_word(word):
    """Decode the packed render word -> (rgb f32 in [0,1] (..., 3), sem i32).

    This is the first op of any consumer of the `raw_out=True` format; it is
    deliberately OUTSIDE the render kernel so 10 Hz consumers (the policy's
    make_batch) pay for the f32 expansion only on the frames they read
    (reference parking_agent.py:228 — the policy consumes every 3rd frame).
    Matches the renderer's own rgb output to 1 ulp (XLA may lower the /255
    differently across separately compiled programs)."""
    rgb = jnp.stack(
        [(word & 0xFF).astype(jnp.float32) / 255.0,
         ((word >> 8) & 0xFF).astype(jnp.float32) / 255.0,
         ((word >> 16) & 0xFF).astype(jnp.float32) / 255.0], axis=-1)
    return rgb, (word >> 24).astype(jnp.int32)


def _wrap(a):
    return (a + np.pi) % (2.0 * np.pi) - np.pi


# ---------------------------------------------------------------------------
# Fused Pallas cull
#
# The XLA-side cull (the `cull="xla"` branch below) is ~25 small kernels per
# frame — elementwise prep over (E, 4, sec, 64), K argmin/extract rounds,
# gathers — whose per-launch overhead inside the 30 Hz scan body was measured
# at ~3.8 ms/frame-batch on v5e (~40% of the whole render). This kernel does
# the whole candidate selection in ONE launch: one grid cell per env, a
# (tiles, 128-lane slot) block, K min-extract rounds along lanes.
#
# The azimuth-overlap test is algebraically identical to the XLA branch but
# trig-free (no atan2/asin in Mosaic): |wrap(az - azc)| <= azh + m + asin(rho)
#   <=>  cos(az - azc) >= cos(azh + m + asin(rho))         [both sides < pi]
#   <=>  relc . u  >=  dist * (CA * sqrt(1 - rho^2) - SA * rho)
# with u = (cos azc, sin azc), CA = cos(azh + m), SA = sin(azh + m) static
# per tile and rho = r_box / max(dist, r_box). Division-free except rho, so
# dist == 0 cannot NaN. Float rounding differs from the atan2 formulation
# only inside an ulp-thin shell around the decision boundary, which the
# 0.02 rad conservative margin dwarfs — so the no-cull bit-parity gate
# (bench.py) holds for either backend.
# ---------------------------------------------------------------------------

_CULL_MARGIN = 0.02
# Distance term of the visibility test = the shared LOD spec
# (sim/camera.py:LOD_RADIUS). Round-4 note: this used to be a
# selection-only 45 m cutoff while the pure renderer drew at any range —
# a box whose CENTER sat at 46.3 m was visible at ~40 m ray depth in the
# rear camera and tripped the 150-frame mid-maneuver bit-parity gate. The
# rule is now a property of the RENDERED IMAGE (both renderers apply it
# with identical f32 ops), so the selection can rely on it exactly.
_CULL_RADIUS = float(cam_lib.LOD_RADIUS)


@functools.lru_cache(maxsize=4)
def _cull_planes(sim_cfg: SimConfig, n_sectors: int):
    """Static (rows, 128) f32 planes for the cull kernel. Rows = (cam,
    sector) tiles padded to a multiple of 8 sublanes; lanes = slot index
    padded 64 -> 128. Pad rows/lanes are killed by a huge camera offset."""
    _, az_center, az_half, origins, _ = _static_tables(sim_cfg, n_sectors)
    n_tiles = 4 * n_sectors
    R = max(8, ((n_tiles + 7) // 8) * 8)
    S = scene_lib.NUM_SLOTS

    def rowplane(per_tile, pad):
        a = np.full((R,), pad, np.float32)
        a[:n_tiles] = per_tile.reshape(-1)
        return np.broadcast_to(a[:, None], (R, LANES)).copy()

    def laneplane(per_slot, pad):
        a = np.full((LANES,), pad, np.float32)
        a[:S] = per_slot
        return np.broadcast_to(a[None, :], (R, LANES)).copy()

    cam_of_tile = np.repeat(np.arange(origins.shape[0]), n_sectors)
    planes = np.stack([
        laneplane(scene_lib.SLOT_XY[:, 0].astype(np.float32), 1e9),
        laneplane(scene_lib.SLOT_XY[:, 1].astype(np.float32), 1e9),
        rowplane(origins[cam_of_tile, 0], 1e9),
        rowplane(origins[cam_of_tile, 1], 1e9),
        rowplane(np.cos(az_center.astype(np.float64)).astype(np.float32), 0.0),
        rowplane(np.sin(az_center.astype(np.float64)).astype(np.float32), 0.0),
        rowplane(np.cos(az_half.astype(np.float64) + _CULL_MARGIN)
                 .astype(np.float32), 1.0),
        rowplane(np.sin(az_half.astype(np.float64) + _CULL_MARGIN)
                 .astype(np.float32), 0.0),
    ])  # (8, R, LANES)
    return planes, R, n_tiles


def _make_cull_kernel(n_boxes: int, r_box: float):
    r2 = r_box * r_box
    INF = float("inf")

    def kernel(ego_ref, npc_ref, planes_ref, idx_ref, d2_ref):
        ex = ego_ref[0, 0, 0]
        ey = ego_ref[0, 0, 1]
        c = ego_ref[0, 0, 2]
        s = ego_ref[0, 0, 3]
        valid = npc_ref[0, 0:1, :]  # (1, 128) 1.0/0.0, broadcasts over rows

        sxv = planes_ref[0]
        syv = planes_ref[1]
        cxv = planes_ref[2]
        cyv = planes_ref[3]
        uxv = planes_ref[4]
        uyv = planes_ref[5]
        cav = planes_ref[6]
        sav = planes_ref[7]

        rx = sxv - ex
        ry = syv - ey
        relv_x = rx * c + ry * s  # R(-yaw)
        relv_y = -rx * s + ry * c
        relc_x = relv_x - cxv
        relc_y = relv_y - cyv
        d2 = relc_x * relc_x + relc_y * relc_y
        dist = jnp.sqrt(d2)
        dot = relc_x * uxv + relc_y * uyv
        rho = r_box / jnp.maximum(dist, r_box)
        cosa = cav * jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0)) - sav * rho
        vis = ((valid > 0.0) & ((dot >= dist * cosa) | (d2 <= r2))
               & (d2 < _CULL_RADIUS ** 2))
        d2s = jnp.where(vis, d2, INF)

        lane = jax.lax.broadcasted_iota(jnp.int32, d2s.shape, 1)
        idx_out = jnp.zeros(d2s.shape, jnp.int32)
        d2_out = jnp.full(d2s.shape, INF, jnp.float32)
        for k in range(n_boxes):
            m = jnp.min(d2s, axis=1, keepdims=True)  # (R, 1)
            pick = jnp.min(jnp.where(d2s == m, lane, LANES), axis=1,
                           keepdims=True)  # lowest index among ties, as argmin
            col_k = lane == k
            idx_out = jnp.where(col_k, pick, idx_out)
            d2_out = jnp.where(col_k, m, d2_out)
            d2s = jnp.where(lane == pick, INF, d2s)
        idx_ref[0] = idx_out
        d2_ref[0] = d2_out

    return kernel


def _cull_pallas(ego_x, ego_y, ego_yaw, scene, sim_cfg: SimConfig,
                 n_boxes: int, n_sectors: int, interpret: bool):
    """Returns (top_idx (E, 4, sec, K) i32, sel_d2 (E, 4, sec, K) f32 with
    +inf marking slots beyond the visible count) — the same selection the
    XLA branch makes, in one kernel launch."""
    E = ego_x.shape[0]
    planes_np, R, n_tiles = _cull_planes(sim_cfg, n_sectors)
    r_box = float(np.hypot(sim_cfg.npc_half_length, sim_cfg.npc_half_width))

    ego = jnp.stack([ego_x, ego_y, jnp.cos(ego_yaw), jnp.sin(ego_yaw)],
                    axis=-1)[:, None, :]  # (E, 1, 4)
    npc = jnp.zeros((E, 8, LANES), jnp.float32)
    npc = npc.at[:, 0, :scene_lib.NUM_SLOTS].set(
        scene.npc_valid.astype(jnp.float32))

    idx, d2 = pl.pallas_call(
        _make_cull_kernel(n_boxes, r_box),
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda e: (e, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, LANES), lambda e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R, LANES), lambda e: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, R, LANES), lambda e: (e, 0, 0)),) * 2,
        out_shape=(jax.ShapeDtypeStruct((E, R, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((E, R, LANES), jnp.float32)),
        interpret=interpret,
    )(ego, npc, jnp.asarray(planes_np))
    top_idx = idx[:, :n_tiles, :n_boxes].reshape(E, 4, n_sectors, n_boxes)
    sel_d2 = d2[:, :n_tiles, :n_boxes].reshape(E, 4, n_sectors, n_boxes)
    return top_idx, sel_d2


def render_cameras_pallas(ego_x, ego_y, ego_yaw, scene, sim_cfg: SimConfig,
                          weather=None, **kw):
    """Non-jitted entry: coerces `debug_zero` to a tuple BEFORE the jit
    boundary so callers holding a list (e.g. straight from json.loads)
    don't hit an unhashable-static-arg error, then dispatches to the
    jitted implementation. See _render_cameras_pallas for the contract."""
    if "debug_zero" in kw:
        kw["debug_zero"] = tuple(kw["debug_zero"])
    return _render_cameras_pallas(ego_x, ego_y, ego_yaw, scene, sim_cfg,
                                  weather, **kw)


@functools.partial(jax.jit, static_argnames=("sim_cfg", "n_boxes", "interpret",
                                              "n_sectors", "bands", "packed",
                                              "cull", "env_chunk", "box_switch",
                                              "skip_sky", "unroll_envs",
                                              "raw_out", "debug_no_boxes",
                                              "debug_zero"))
def _render_cameras_pallas(ego_x, ego_y, ego_yaw, scene, sim_cfg: SimConfig,
                           weather=None, n_boxes: int = 3,
                           interpret: bool = False, n_sectors: int = 4,
                           bands: int = 4, packed: bool = True,
                           cull: str = "pallas", env_chunk: int = 32,
                           box_switch: str = "single", skip_sky: bool = True,
                           unroll_envs: bool = True, raw_out: bool = False,
                           debug_no_boxes: bool = False,
                           debug_zero: tuple = ()):
    """Batched fused render. ego_* are (E,); scene is a batched SceneState.

    n_boxes: candidate boxes kept per (camera, sector) tile — the culling
    keeps the nearest n_boxes that can geometrically intersect the sector
    (>= NUM_SLOTS disables culling: exact).

    cull: "pallas" (one fused selection kernel) or "xla" (the plain-XLA
    selection it replaced; kept for the hardware A/B and as the tie-break
    semantics reference). Both make the same selection up to float ulps at
    the conservative test's decision boundary.

    env_chunk: envs rendered per grid cell (clamped down to divide E);
    amortizes the per-grid-cell fixed cost that dominates at chunk 1 (see
    _make_kernel). Bit-exact for any value.

    Round-5 defaults (v5e sweep, tools/bench_chunk_sweep.py + BENCH.md):
    env_chunk 32 + 4 sectors + 4 elevation bands + statically-unrolled env
    loop + box_switch="single" + fma sky planes, 55.5k env steps/s
    every-frame vs 37.8k at the round-3 shape (chunk 1, 8 sectors, bands
    2). box_switch="nested" pathologizes once the per-cell ground pl.when
    hoist landed (32 unrolled envs x 3 nested conds each blows Mosaic's
    pipeline: 26.3k vs 49.5k measured, bench_floor_r4.log) — "single"
    keeps ONE cond per env and is bit-exact. bands=4 (finer static box
    occupancy + more all-sky bands skipping ground/lines work) measured
    +10% over bands=2 at these defaults; bands=8 and 8-sector combos
    regress (grid-cell overhead). Wider sectors keep the same K=3 nearest boxes over 2x the
    azimuth: LOD pixel delta rises to ~1.4% at start poses (gate bound
    2%); K=2 was measured OVER budget (2.2% at start poses) and rejected.
    bf16 kernel math was measured OFF the table on this chip: a
    dependent-chain VPU microbench runs 0.91 Top/s in f32 vs 0.87 in bf16
    (no packed-execution win to buy). Attribution at these defaults:
    ~1.2 us/env-step non-render glue (dynamics+expert), ~15 us kernel
    floor (ground+sky+pack+writes+cull), ~4 us box bodies.

    Returns dict rgb (E, 4, H, W, 3), depth (E, 4, H, W), sem (E, 4, H, W).
    """
    E = ego_x.shape[0]
    H, W = sim_cfg.cam_height, sim_cfg.cam_width
    # Mosaic needs tile sublanes % 8 == 0: drop to fewer sectors for small
    # test images (256^2 supports 8 sectors; 64^2 supports 4)
    while n_sectors > 1 and (W % n_sectors != 0
                             or (H * (W // n_sectors)) % (8 * LANES) != 0):
        n_sectors //= 2
    Ws = W // n_sectors
    tile_rows = (H * Ws) // LANES
    assert tile_rows % 8 == 0
    rows = 4 * n_sectors * tile_rows
    n_tiles = 4 * n_sectors
    n_boxes = min(n_boxes, scene_lib.NUM_SLOTS)

    planes_np, az_center, az_half, origins, band_tabs = _static_tables(
        sim_cfg, n_sectors)
    planes = tuple(jnp.asarray(planes_np[k])
                   for k in ("dx", "dy", "tg", "elev_a", "elev_b", "zn", "zf"))
    # per-tile (ox, oy) vehicle-frame camera origin, flat for SMEM (camera
    # count derived from the rig so it tracks SimConfig)
    cam_of_tile = np.repeat(np.arange(origins.shape[0]), n_sectors)
    org_tile = jnp.asarray(
        origins[cam_of_tile][:, :2].reshape(-1).astype(np.float32))

    if weather is None:
        weather = jnp.zeros((E,), jnp.int32)
    wrow = jnp.asarray(cam_lib.WEATHER_TABLE)[weather % len(cam_lib.WEATHER_TABLE)]

    slot_xy = jnp.asarray(scene_lib.SLOT_XY)
    target_xy = slot_xy[scene.target_idx]  # (E, 2)
    env_scalars = jnp.zeros((E, ENV_FIELDS), jnp.float32)
    env_scalars = env_scalars.at[:, 0].set(ego_x)
    env_scalars = env_scalars.at[:, 1].set(ego_y)
    env_scalars = env_scalars.at[:, 2].set(jnp.cos(ego_yaw))
    env_scalars = env_scalars.at[:, 3].set(jnp.sin(ego_yaw))
    env_scalars = env_scalars.at[:, 4].set(target_xy[:, 0])
    env_scalars = env_scalars.at[:, 5].set(target_xy[:, 1])
    env_scalars = env_scalars.at[:, 6].set(wrow[:, 0])
    env_scalars = env_scalars.at[:, 7:10].set(wrow[:, 1:4])

    # ---- cull per (env, camera, sector): exact conservative test ----
    r_box = float(np.hypot(sim_cfg.npc_half_length, sim_cfg.npc_half_width))
    if cull == "pallas":
        # one fused selection kernel (see _cull_pallas above)
        top_idx, sel_d2 = _cull_pallas(ego_x, ego_y, ego_yaw, scene, sim_cfg,
                                       n_boxes, n_sectors, interpret)
        sel_valid = jnp.isfinite(sel_d2)  # (E, 4, sec, K)
        sel_dist = jnp.sqrt(sel_d2)  # +inf past the visible count (unused)
    else:
        # plain-XLA selection: box position in the vehicle frame, relative
        # to each camera origin
        c_yaw, s_yaw = jnp.cos(ego_yaw), jnp.sin(ego_yaw)  # (E,)
        rx = slot_xy[None, :, 0] - ego_x[:, None]  # (E, S)
        ry = slot_xy[None, :, 1] - ego_y[:, None]
        relv_x = rx * c_yaw[:, None] + ry * s_yaw[:, None]  # R(-yaw)
        relv_y = -rx * s_yaw[:, None] + ry * c_yaw[:, None]
        cam_xy = jnp.asarray(origins[:, :2])  # (4, 2) vehicle frame
        relc_x = relv_x[:, None, :] - cam_xy[None, :, 0, None]  # (E, 4, S)
        relc_y = relv_y[:, None, :] - cam_xy[None, :, 1, None]
        d2 = relc_x * relc_x + relc_y * relc_y
        dist = jnp.sqrt(d2)
        az_box = jnp.arctan2(relc_y, relc_x)  # (E, 4, S) vehicle frame
        ang_half = jnp.arcsin(
            jnp.clip(r_box / jnp.maximum(dist, r_box), 0.0, 1.0))
        inside = dist <= r_box  # camera inside the box radius: always keep

        centers = jnp.asarray(az_center)  # (4, S_sec)
        halves = jnp.asarray(az_half)
        dev = az_box[:, :, None, :] - centers[None, :, :, None]  # (E,4,sec,S)
        dev = (dev + np.pi) % (2.0 * np.pi) - np.pi
        overlap = jnp.abs(dev) <= (halves[None, :, :, None]
                                   + ang_half[:, :, None, :] + _CULL_MARGIN)
        vis = (scene.npc_valid[:, None, None, :]
               & (overlap | inside[:, :, None, :])
               & (d2[:, :, None, :] < _CULL_RADIUS ** 2))
        d2s = jnp.where(vis, d2[:, :, None, :], jnp.inf)  # (E, 4, sec, S)
        # K nearest by repeated argmin-extract: K cheap reduces instead of
        # a full lax.top_k sort
        slot_iota = jnp.arange(slot_xy.shape[0], dtype=jnp.int32)
        picks = []
        for _ in range(n_boxes):
            i = jnp.argmin(d2s, axis=-1).astype(jnp.int32)  # (E, 4, sec)
            picks.append(i)
            d2s = jnp.where(slot_iota == i[..., None], jnp.inf, d2s)
        top_idx = jnp.stack(picks, axis=-1)  # (E, 4, sec, K)
        sel_valid = jnp.take_along_axis(vis, top_idx, axis=-1)
        sel_dist = jnp.take_along_axis(
            jnp.broadcast_to(dist[:, :, None, :], vis.shape), top_idx, axis=-1)
    palette = jnp.asarray(cam_lib._vehicle_palette())

    def pack_boxes(idx, valid_row, yaw_row):
        # idx/valid rows (4, sec, K); yaw rows (4, sec, S)
        sel_xy = slot_xy[idx]
        sel_yaw = jnp.take_along_axis(yaw_row, idx, axis=-1)
        # color code doubles as the valid flag: palette index, -1 = invalid
        code = jnp.where(valid_row, idx.astype(jnp.float32), -1.0)
        return jnp.concatenate([
            sel_xy,
            jnp.cos(sel_yaw)[..., None], jnp.sin(sel_yaw)[..., None],
            code[..., None],
        ], axis=-1).reshape(-1)  # (n_tiles * K * BOX_FIELDS,) — SMEM pads
        # the minor dimension to 128 lanes, so scalar payloads stay flat

    S = slot_xy.shape[0]
    boxes = jax.vmap(pack_boxes)(
        top_idx, sel_valid,
        jnp.broadcast_to(scene.npc_yaw[:, None, None, :], (E, 4, n_sectors, S)))

    # ---- elevation bands (VERDICT r2 item 5) ----
    # Split each tile into B elevation bands when the 4-bit-per-band count
    # packing allows it (n_boxes <= 15) and the sub-tile keeps Mosaic's
    # 8-sublane alignment. Static per band: the z-slab visibility window
    # [lo, hi] in horizontal metres and the all-sky flag.
    # `bands` is the MAX split (0/1 disables). More bands = finer static
    # culling but an n_bands-times larger grid of n_bands-times smaller
    # blocks; past ~2 the per-grid-cell overhead beats the skipped work
    # (measured on v5e: bands=8 18.1k env steps/s vs bands=2 at the
    # tools/bench_render_ab.py sweep optimum).
    n_bands = 1
    if bands and bands > 1 and n_boxes <= 15:
        for cand in (8, 4, 2):
            if cand <= bands and tile_rows % cand == 0 \
                    and (tile_rows // cand) % 8 == 0:
                n_bands = cand
                break
    band_rows = tile_rows // n_bands
    row_lo = band_tabs["row_lo"].reshape(n_tiles, n_bands, -1).min(axis=2)
    row_hi = band_tabs["row_hi"].reshape(n_tiles, n_bands, -1).max(axis=2)
    skyband = jnp.asarray(
        band_tabs["sky_row"].reshape(n_tiles, n_bands, -1).all(axis=2)
        .reshape(-1).astype(np.int32))

    if n_bands > 1:
        # candidate visible in band iff its horizontal-distance interval
        # overlaps the band's static window; per-band prefix bound packed
        # 4 bits per band into one i32 per (env, tile). sel_dist is +inf
        # past the visible count on the pallas-cull path — band_vis is
        # False there either way (sel_valid gates it).
        blo = jnp.asarray(row_lo.reshape(4, n_sectors, n_bands))
        bhi = jnp.asarray(row_hi.reshape(4, n_sectors, n_bands))
        band_vis = (sel_valid[..., None]
                    & (sel_dist[..., None] - r_box < bhi[None, :, :, None, :])
                    & (sel_dist[..., None] + r_box
                       > blo[None, :, :, None, :]))  # (E, 4, sec, K, B)
        prefix = (jnp.arange(1, n_boxes + 1, dtype=jnp.int32)
                  [None, None, None, :, None] * band_vis)
        kmax_band = prefix.max(axis=3).astype(jnp.int32)  # (E, 4, sec, B)
        shifts = (jnp.arange(n_bands, dtype=jnp.int32) * 4)
        kmax = (kmax_band << shifts[None, None, None, :]).sum(
            axis=-1).reshape(E, n_tiles).astype(jnp.int32)
    else:
        kmax = sel_valid.sum(axis=-1).reshape(E, n_tiles).astype(jnp.int32)
    if debug_no_boxes:
        # diagnostic floor: keep the full cull + glue but run zero box
        # bodies in-kernel (isolates in-kernel box cost from selection cost)
        kmax = jnp.zeros_like(kmax)

    # env chunk: clamp down to a divisor of E (tiny test fleets stay valid)
    EC = max(1, min(env_chunk, E))
    while E % EC:
        EC -= 1

    kernel = _make_kernel(sim_cfg, n_boxes, n_bands, packed, EC,
                          box_switch, skip_sky, unroll_envs,
                          tuple(debug_zero))
    plane_spec = pl.BlockSpec((band_rows, LANES), lambda t, e: (t, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((EC, band_rows, LANES), lambda t, e: (e, t, 0),
                            memory_space=pltpu.VMEM)
    if packed:
        out_shape = (jax.ShapeDtypeStruct((E, rows, LANES), jnp.int32),
                     jax.ShapeDtypeStruct((E, rows, LANES), jnp.float32))
    else:
        out_shape = tuple(
            jax.ShapeDtypeStruct((E, rows, LANES), dt)
            for dt in (jnp.float32, jnp.float32, jnp.float32, jnp.int32,
                       jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles * n_bands, E // EC),
        in_specs=[
            # per-env scalar operands blocked by the env grid axis: one
            # chunk of env rows per window (a full (E, .) SMEM window is
            # 2 MB of boxes alone at E=1024, over the 1 MB SMEM). The
            # arrays carry a unit middle axis because Mosaic requires the
            # last two block dims to equal the array dims (or be
            # 8/128-aligned) even in SMEM — (EC, 1, N) blocks of an
            # (E, 1, N) array satisfy that.
            pl.BlockSpec((EC, 1, ENV_FIELDS), lambda t, e: (e, 0, 0),
                         memory_space=pltpu.SMEM),  # env scalars
            pl.BlockSpec((EC, 1, n_tiles * n_boxes * BOX_FIELDS),
                         lambda t, e: (e, 0, 0),
                         memory_space=pltpu.SMEM),  # packed boxes
            pl.BlockSpec(memory_space=pltpu.SMEM),  # vehicle palette
            pl.BlockSpec((EC, 1, n_tiles), lambda t, e: (e, 0, 0),
                         memory_space=pltpu.SMEM),  # per-tile/band counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # static all-sky band flag
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile camera origins
            *([plane_spec] * 7),
        ],
        out_specs=(out_spec,) * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(env_scalars[:, None, :], boxes.reshape(E, 1, -1),
      palette.reshape(-1), kmax.reshape(E, 1, -1), skyband, org_tile, *planes)

    def unflatten(a):
        # (E, rows, LANES) laid out (cam, sector, row, col-in-sector)
        a = a.reshape(E, 4, n_sectors, H, Ws)
        return a.transpose(0, 1, 3, 2, 4).reshape(E, 4, H, W)

    if packed and raw_out:
        # native consumption format: ONE int32 word per pixel (r | g<<8 |
        # b<<16 | sem<<24, 8-bit-quantized color — the reference's PNG
        # precision) + the f32 depth plane. Decode with unpack_rgb_word.
        rgbs, depth = outs
        return {"word": unflatten(rgbs), "depth": unflatten(depth)}
    if packed:
        rgbs, depth = outs
        word = unflatten(rgbs)
        rgb = jnp.stack(
            [(word & 0xFF).astype(jnp.float32) / 255.0,
             ((word >> 8) & 0xFF).astype(jnp.float32) / 255.0,
             ((word >> 16) & 0xFF).astype(jnp.float32) / 255.0], axis=-1)
        return {
            "rgb": rgb,
            "depth": unflatten(depth),
            "sem": (word >> 24).astype(jnp.int32),
        }
    r, g, b, sem, depth = outs
    return {
        "rgb": jnp.stack([unflatten(r), unflatten(g), unflatten(b)], axis=-1),
        "depth": unflatten(depth),
        "sem": unflatten(sem),
    }
