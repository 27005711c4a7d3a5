"""Fully-fused persistent wavefront megakernel (diffuse fast path).

The per-bounce kernel (path_kernel.py) still exits to XLA once per
wavefront iteration for hash RNG, camera-ray regeneration, film
accumulation and the regen selects — at cbox scale that glue reads and
writes ~25 rows x 262k lanes of HBM per bounce. This kernel moves the
ENTIRE persistent-wavefront loop (integrators/path.py docstring) inside
one `pallas_call`: each grid program owns a block of lanes and runs the
full work queue to completion in VMEM — counter-hash uniforms, path
advance (closest hit, emissive MIS, NEE + shadow cast, cosine sampling,
RR), film accumulation and immediate path regeneration with in-kernel
camera sampling. HBM traffic drops to: read scene tables once per
program, write the (3, BLOCK) film slice once.

Key structural facts exploited:
- lane pool == pixel count, so work item i runs on lane i%n and its
  pixel IS its lane: film accumulation is a per-lane register add, no
  scatter of any kind (cf. path.py _dense_film_add).
- RNG is the same (seed, item, bounce, dim) pcg-hash counter stream the
  XLA driver uses (path.py _pcg_hash): resuming/restarting at any block
  boundary is exact, and engines agree statistically.
- Mosaic cannot carry i1 vectors through `lax.while_loop`, so the
  done/alive masks are carried as int32 and converted locally.

Reference hot loop this replaces: src/path_tracing.h:66-323 (the whole
per-sample recursion), src/render.cpp:75-98 (the tile loop).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lajolla_tpu.integrators.path_kernel import (_advance_core, _norm3,
                                                 _woop_mat)
from lajolla_tpu.scene.types import FILTER_BOX, FILTER_TENT, FILTER_GAUSSIAN

BLOCK = 4096
TWO_PI = 6.283185307179586
_GOLD = 0x9E3779B9
INTERPRET = False   # set True to run the kernel in interpreter mode on
                    # CPU (semantic debugging; tests/test_kernel_engine.py)


def _pcg_hash(v):
    v = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    w = ((v >> ((v >> jnp.uint32(28)) + jnp.uint32(4))) ^ v) \
        * jnp.uint32(277803737)
    return (w >> jnp.uint32(22)) ^ w


def _u01(h):
    """uint32 hash -> U[0,1) float32 (top 24 bits)."""
    return jax.lax.bitcast_convert_type(h >> jnp.uint32(8),
                                        jnp.int32).astype(
        jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _primary(item, px, py, su, cam, *, w, h, filter_type, filter_param):
    """In-kernel camera ray for work items (1,B). Mirrors
    path.py _primary_hash -> scene/camera.py sample_primary
    (src/camera.cpp:23-47). cam: (32,) SMEM ref
    [sample_to_cam flat 16, cam_to_world flat 16]."""
    hp = _pcg_hash(jax.lax.bitcast_convert_type(item, jnp.uint32) ^
                   _pcg_hash(su ^ jnp.uint32(0xCAFEF00D)))
    u0 = _u01(_pcg_hash(hp + jnp.uint32(_GOLD)))
    u1 = _u01(_pcg_hash(hp + jnp.uint32(2 * _GOLD & 0xFFFFFFFF)))
    if filter_type == FILTER_BOX:
        ox = (2.0 * u0 - 1.0) * (filter_param / 2.0)
        oy = (2.0 * u1 - 1.0) * (filter_param / 2.0)
    elif filter_type == FILTER_TENT:
        fh = filter_param / 2.0
        warp = lambda r: jnp.where(
            r < 0.5, fh * (jnp.sqrt(2.0 * r) - 1.0),
            fh * (1.0 - jnp.sqrt(jnp.maximum(1.0 - 2.0 * (r - 0.5), 0.0))))
        ox, oy = warp(u0), warp(u1)
    elif filter_type == FILTER_GAUSSIAN:
        r = filter_param * jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u0, 1e-8)))
        ox = r * jnp.cos(TWO_PI * u1)
        oy = r * jnp.sin(TWO_PI * u1)
    else:
        raise ValueError(f"unknown filter type {filter_type}")
    x = (px + 0.5 + ox) * jnp.float32(1.0 / w)
    y = (py + 0.5 + oy) * jnp.float32(1.0 / h)
    # pt = sample_to_cam @ [x, y, 0, 1] with homogeneous divide
    rx = cam[0] * x + cam[1] * y + cam[3]
    ry = cam[4] * x + cam[5] * y + cam[7]
    rz = cam[8] * x + cam[9] * y + cam[11]
    rw = cam[12] * x + cam[13] * y + cam[15]
    inv_w = 1.0 / rw
    cx, cy, cz = _norm3(rx * inv_w, ry * inv_w, rz * inv_w)
    dx = cam[16] * cx + cam[17] * cy + cam[18] * cz
    dy = cam[20] * cx + cam[21] * cy + cam[22] * cz
    dz = cam[24] * cx + cam[25] * cy + cam[26] * cz
    dx, dy, dz = _norm3(dx, dy, dz)
    d = jnp.concatenate([dx, dy, dz], axis=0)
    ones = jnp.ones_like(dx)
    org = jnp.concatenate([cam[19] * ones, cam[23] * ones, cam[27] * ones],
                          axis=0)
    return org, d


def _kernel(seed_ref, s0_ref, cam_ref, woop_ref, woop_occ_ref, tri_ref,
            triA_ref, triB_ref, qf_ref, qfocc_ref,
            light_ref, stair_ref, sph_ref, film_o, *, n, w, h, nspp,
            filter_type, filter_param, **statics):
    su = seed_ref[0]                  # uint32 scalar
    s0 = s0_ref[0]
    pid = pl.program_id(0)
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) +
            pid * BLOCK)
    pixel = lane                      # lane pool == film (see docstring)
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)
    cam = cam_ref
    woop = woop_ref[:]
    woop_occ = woop_occ_ref[:]
    tri = tri_ref[:]
    triA = triA_ref[:]
    triB = triB_ref[:]
    qf = qf_ref[:]
    qf_occ = qfocc_ref[:]
    light = light_ref[:]
    stair = stair_ref[:]
    sph = sph_ref[:]
    kidx = (jax.lax.broadcasted_iota(jnp.uint32, (8, 1), 0) *
            jnp.uint32(_GOLD) + jnp.uint32(_GOLD))

    prim = functools.partial(_primary, px=px, py=py, su=su, cam=cam,
                             w=w, h=h, filter_type=filter_type,
                             filter_param=filter_param)
    item0 = lane + s0 * n
    end = (s0 + nspp) * n
    org0, d0 = prim(item0)
    z3 = jnp.zeros((3, BLOCK), jnp.float32)
    z1 = jnp.zeros((1, BLOCK), jnp.float32)
    state0 = (item0, jnp.full((1, BLOCK), 2, jnp.int32),
              org0, d0, jnp.ones((3, BLOCK), jnp.float32), z3, z1, org0,
              jnp.zeros((1, BLOCK), jnp.int32),   # done (i32: no i1 carry)
              z3)                                 # film accumulator

    def cond(carry):
        return jnp.min(carry[8]) < 1

    def body(carry):
        item, nv, org, d, thr, rad, dir_pdf, prev, done, film = carry
        act = done < 1
        hb = _pcg_hash(jax.lax.bitcast_convert_type(item, jnp.uint32) ^
                       _pcg_hash(jax.lax.bitcast_convert_type(nv,
                                                              jnp.uint32) ^
                                 su))
        un = _u01(_pcg_hash(hb + kidx))           # (8, B)
        org2, d2, thr2, rad2, dp2, alive = _advance_core(
            org, d, thr, rad, nv.astype(jnp.float32), dir_pdf, prev, un,
            act, woop, woop_occ, tri, triA, triB, qf, qf_occ, light,
            stair, sph, **statics)
        died = act & ~alive
        # NaN/Inf exclusion on the splat (render.cpp:140-143): one
        # non-finite path must not poison its pixel for the whole launch.
        # Whole-sample like the reference: any non-finite channel drops
        # all three (keeps engine parity with path.py's splat).
        fin = jnp.all(jnp.isfinite(rad2), axis=0, keepdims=True)
        film = film + jnp.where(died & fin, rad2, 0.0)
        next_item = item + n
        has_more = next_item < end
        regen = died & has_more
        done = jnp.maximum(done, (died & ~has_more).astype(jnp.int32))
        rorg, rd = prim(next_item)
        sel = lambda a, b: jnp.where(regen, a, b)
        return (sel(next_item, item),
                sel(jnp.full_like(nv, 2), nv + 1),
                sel(rorg, org2), sel(rd, d2),
                sel(jnp.ones_like(thr2), thr2),
                sel(jnp.zeros_like(rad2), rad2),
                sel(jnp.zeros_like(dp2), dp2),
                sel(rorg, org2),
                done, film)

    final = jax.lax.while_loop(cond, body, state0)
    film_o[:] = final[9]


def render_fused(scene, options, seed, s0, nspp):
    """Render nspp samples/pixel (sample indices s0..s0+nspp) of the full
    film in ONE persistent kernel launch. Returns the film SUM (n-pixel
    lane pool; see module docstring). Requires supports(scene.meta) and
    n % BLOCK == 0."""
    from lajolla_tpu.dtypes import intersection_eps, shadow_eps
    from lajolla_tpu.integrators.path import MAX_BOUNCES_CAP
    w, h = scene.meta.width, scene.meta.height
    n = w * h
    assert n % BLOCK == 0
    T = scene.fp_tri.shape[1]
    L = scene.fp_light.shape[1]
    seed_a = jnp.asarray(seed, jnp.uint32).reshape(1)
    s0_a = jnp.asarray(s0, jnp.int32).reshape(1)
    cam = jnp.concatenate([scene.sample_to_cam.reshape(-1),
                           scene.cam_to_world.reshape(-1)]).astype(
                               jnp.float32)
    S = scene.meta.num_spheres
    TC = scene.fp_woop.shape[0]
    T_OCC = scene.fp_woop_occ.shape[0]
    kern = functools.partial(
        _kernel, n=n, w=w, h=h, nspp=nspp,
        filter_type=options.filter_type, filter_param=options.filter_param,
        T=T, TC=TC, T_OCC=T_OCC, L=L, S=S,
        mats=scene.meta.mat_types_present,
        has_quads=scene.meta.has_quads,
        eps_isect=intersection_eps(scene.meta.scene_radius),
        eps_shadow=shadow_eps(scene.meta.scene_radius),
        max_depth=options.max_depth, rr_depth=options.rr_depth,
        max_cap=MAX_BOUNCES_CAP)
    full = lambda i: (0, 0)
    tab = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.VMEM)
    film = pl.pallas_call(
        kern,
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  tab((3 * TC, 4)), tab((3 * T_OCC, 4)), tab((40, T)),
                  tab((40, TC)), tab((40, TC)), tab((TC, 1)),
                  tab((T_OCC, 1)),
                  tab((16, L)), tab((1, T)),
                  tab((max(S, 1), 24))],
        out_specs=pl.BlockSpec((3, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        interpret=INTERPRET,
    )(seed_a, s0_a, cam, _woop_mat(scene.fp_woop),
      _woop_mat(scene.fp_woop_occ), scene.fp_tri,
      scene.fp_tri[:, scene.cast_src], scene.fp_tri[:, scene.cast_alt],
      scene.cast_quad[:, None], scene.cast_occ_quad[:, None],
      scene.fp_light, scene.tri_stair_cdf[None, :], scene.fp_sph)
    return film.T.reshape(h, w, 3)
