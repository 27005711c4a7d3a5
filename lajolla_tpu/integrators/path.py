"""Unidirectional surface path tracer, wavefront-style.

Faithful re-derivation of the reference integrator (src/path_tracing.h):
NEE with power-heuristic (k=2) MIS against BSDF sampling, solid-angle →
area measure conversion through the geometry term, Mitsuba/pbrt-style
Russian roulette with eta_scale tracking, filter importance sampling.

TPU-native structure: the per-path recursion-as-loop becomes a per-path
`lax.while_loop` (one iteration per bounce), vmapped over a megabatch of
paths — JAX's while_loop batching rule yields exactly the lockstep
masked wavefront loop, freezing finished lanes. The spp loop is a
`lax.fori_loop` accumulating the film on device, so a full render is one
XLA program.
"""

from functools import partial

import jax
import jax.numpy as jnp

from lajolla_tpu.core.math import distance_squared, dot, length, normalize
from lajolla_tpu.dtypes import intersection_eps, shadow_eps
from lajolla_tpu.integrators.lights import (emission_area, emission_envmap,
                                            light_pmf, pdf_point_on_light,
                                            sample_light,
                                            sample_point_on_light)
from lajolla_tpu.materials import eval_bsdf, pdf_bsdf, sample_bsdf
from lajolla_tpu.scene.camera import sample_primary
from lajolla_tpu.scene.geometry import intersect_scene, occluded
from lajolla_tpu.scene.types import LIGHT_ENVMAP

INF = jnp.float32(jnp.inf)
MAX_BOUNCES_CAP = 64  # hard cap when max_depth == -1 (RR drives termination)


def _ray_diff_reflect(spread, radius, mean_curvature, roughness):
    """ray.h:45-51."""
    spec = spread + 2.0 * mean_curvature * radius
    return jnp.maximum(spec * (1.0 - roughness) + 0.2 * roughness, 0.0)


def _ray_diff_refract(spread, radius, mean_curvature, eta, roughness):
    """ray.h:54-66."""
    spec = (spread + 2.0 * mean_curvature * radius) / eta
    return jnp.maximum(spec * (1.0 - roughness) + 0.2 * roughness, 0.0)


def path_trace_one(scene, options, px, py, key):
    """Estimate radiance for one path through pixel (px, py). Scalar;
    vmapped by render_path."""
    w = scene.meta.width
    h = scene.meta.height
    eps_shadow = shadow_eps(scene.meta.scene_radius)
    eps_isect = intersection_eps(scene.meta.scene_radius)
    max_depth = options.max_depth

    key, sub = jax.random.split(key)
    u_pix = jax.random.uniform(sub, (2,))
    org, d = sample_primary(scene, options, px.astype(jnp.float32),
                            py.astype(jnp.float32), u_pix)
    spread = jnp.float32(0.25 / max(w, h))
    radius = jnp.float32(0.0)

    hit = intersect_scene(scene, org, d, 0.0, INF, radius, spread)
    radius = radius + spread * jnp.where(hit.valid, hit.t, 0.0)

    # miss → envmap
    env_miss = emission_envmap(scene, d, spread) if scene.meta.has_envmap \
        else jnp.zeros(3)
    radiance = jnp.where(hit.valid, 0.0, env_miss)

    # first-hit emission
    radiance = radiance + jnp.where(
        hit.valid & (hit.light_id >= 0),
        emission_area(scene, hit.light_id, hit.geometry_normal, -d),
        0.0)

    throughput = jnp.ones(3)
    eta_scale = jnp.float32(1.0)

    State = (key, org, d, spread, radius, hit, throughput, radiance,
             eta_scale, jnp.int32(3), hit.valid)

    def cond(st):
        (_key, _o, _d, _sp, _ra, _hit, _T, _L, _es, nv, active) = st
        depth_ok = (nv < 3 + MAX_BOUNCES_CAP) if max_depth == -1 \
            else (nv <= max_depth + 1)
        return active & depth_ok

    def body(st):
        (key, org, d, spread, radius, hit, throughput, radiance,
         eta_scale, nv, active) = st
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (8,))
        dir_view = -d
        mat_id = hit.material_id

        # ---------------- NEE (path_tracing.h:98-207) -----------------------
        light_id = sample_light(scene, u[2])
        lp = sample_point_on_light(scene, light_id, hit.position,
                                   u[0:2], u[3])
        is_env = (scene.light_type[light_id] == LIGHT_ENVMAP) \
            if scene.meta.has_envmap else jnp.bool_(False)

        dir_light_area = normalize(lp.position - hit.position)
        dir_light = jnp.where(is_env, -lp.normal, dir_light_area)
        dist2 = distance_squared(lp.position, hit.position)
        tfar = jnp.where(is_env, INF,
                         (1.0 - eps_shadow) * jnp.sqrt(dist2))
        occ = occluded(scene, hit.position, dir_light, eps_shadow, tfar)
        G_area = jnp.maximum(-dot(dir_light, lp.normal), 0.0) / \
            jnp.maximum(dist2, 1e-20)
        G = jnp.where(occ, 0.0, jnp.where(is_env, 1.0, G_area))

        p1 = light_pmf(scene, light_id) * \
            pdf_point_on_light(scene, light_id, lp, hit.position)
        nee_ok = (G > 0) & (p1 > 0)
        f_nee = eval_bsdf(scene, mat_id, dir_view, dir_light, hit)
        L_nee = jnp.where(is_env,
                          emission_envmap(scene, dir_light, 0.0),
                          emission_area(scene, light_id, lp.normal,
                                        -dir_light))
        p2_nee = pdf_bsdf(scene, mat_id, dir_view, dir_light, hit) * G
        w1 = (p1 * p1) / jnp.maximum(p1 * p1 + p2_nee * p2_nee, 1e-30)
        C1 = G * f_nee * L_nee / jnp.maximum(p1, 1e-30)
        radiance = radiance + jnp.where(nee_ok,
                                        throughput * C1 * w1, 0.0)

        # ---------------- BSDF sampling (path_tracing.h:210-307) ------------
        rec = sample_bsdf(scene, mat_id, dir_view, hit, u[4:6], u[6])
        dir_bsdf = rec.dir_out
        active2 = active & rec.valid

        is_refract = rec.eta != 0.0
        new_spread = jnp.where(
            is_refract,
            _ray_diff_refract(spread, radius, hit.mean_curvature,
                              jnp.maximum(rec.eta, 1e-6), rec.roughness),
            _ray_diff_reflect(spread, radius, hit.mean_curvature,
                              rec.roughness))
        eta_scale = jnp.where(is_refract,
                              eta_scale / jnp.maximum(rec.eta * rec.eta,
                                                      1e-12),
                              eta_scale)

        nhit = intersect_scene(scene, hit.position, dir_bsdf, eps_isect, INF,
                               radius, new_spread)
        new_radius = radius + new_spread * jnp.where(nhit.valid, nhit.t, 0.0)

        G2 = jnp.where(nhit.valid,
                       jnp.abs(dot(dir_bsdf, nhit.geometry_normal)) /
                       jnp.maximum(distance_squared(nhit.position,
                                                    hit.position), 1e-20),
                       1.0)
        f2 = eval_bsdf(scene, mat_id, dir_view, dir_bsdf, hit)
        p2s = pdf_bsdf(scene, mat_id, dir_view, dir_bsdf, hit)
        active2 = active2 & (p2s > 0)
        p2 = p2s * G2

        # hit an emissive surface → MIS
        hit_light = nhit.valid & (nhit.light_id >= 0)
        L2 = emission_area(scene, nhit.light_id, nhit.geometry_normal,
                           -dir_bsdf)
        lp2 = type(lp)(position=nhit.position, normal=nhit.geometry_normal)
        p1_2 = light_pmf(scene, nhit.light_id) * \
            pdf_point_on_light(scene, nhit.light_id, lp2, hit.position)
        w2 = (p2 * p2) / jnp.maximum(p1_2 * p1_2 + p2 * p2, 1e-30)
        C2 = G2 * f2 * L2 / jnp.maximum(p2, 1e-30)
        radiance = radiance + jnp.where(active2 & hit_light,
                                        throughput * C2 * w2, 0.0)

        # miss → envmap MIS
        if scene.meta.has_envmap:
            L2e = emission_envmap(scene, dir_bsdf, new_spread)
            lpe = type(lp)(position=jnp.zeros(3), normal=-dir_bsdf)
            env_id = scene.meta.envmap_light_id
            p1_e = light_pmf(scene, env_id) * \
                pdf_point_on_light(scene, jnp.int32(env_id), lpe,
                                   hit.position)
            w2e = (p2 * p2) / jnp.maximum(p1_e * p1_e + p2 * p2, 1e-30)
            C2e = G2 * f2 * L2e / jnp.maximum(p2, 1e-30)
            radiance = radiance + jnp.where(active2 & ~nhit.valid,
                                            throughput * C2e * w2e, 0.0)

        active2 = active2 & nhit.valid

        # Russian roulette (path_tracing.h:310-318)
        do_rr = (nv - 1) >= options.rr_depth
        rr_prob = jnp.where(
            do_rr,
            jnp.minimum(jnp.max(throughput / eta_scale), 0.95),
            1.0)
        active2 = active2 & (u[7] <= rr_prob)

        new_T = throughput * (G2 * f2) / jnp.maximum(p2 * rr_prob, 1e-30)

        return (key, hit.position, dir_bsdf, new_spread, new_radius, nhit,
                jnp.where(active2, new_T, throughput), radiance, eta_scale,
                nv + 1, active2)

    st = jax.lax.while_loop(cond, body, State)
    return st[7]


@partial(jax.jit, static_argnames=('options', 'nspp'))
def _render_block(scene, options, seed, s0, nspp):
    """Render `nspp` samples/pixel starting at sample index s0,
    accumulating on device. One XLA program per block keeps individual
    device launches short (long-running single programs can trip runtime
    watchdogs)."""
    w = scene.meta.width
    h = scene.meta.height
    n = w * h
    root = jax.random.key(seed)
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % w).astype(jnp.int32)
    py = (pix // w).astype(jnp.int32)
    pixel_keys = jax.vmap(jax.random.fold_in, (None, 0))(root, pix)

    trace = jax.vmap(path_trace_one, in_axes=(None, None, 0, 0, 0))

    def one_spp(i, img):
        keys = jax.vmap(jax.random.fold_in, (0, None))(
            pixel_keys, (s0 + i).astype(jnp.uint32))
        L = trace(scene, options, px, py, keys)
        return img + L

    img = jax.lax.fori_loop(0, nspp, one_spp,
                            jnp.zeros((n, 3), jnp.float32))
    return img.reshape(h, w, 3)


SPP_BLOCK = 8


def render_path(scene, options, seed=0):
    spp = options.samples_per_pixel
    img = None
    s0 = 0
    while s0 < spp:
        ns = min(SPP_BLOCK, spp - s0)
        block = _render_block(scene, options, seed, s0, ns)
        img = block if img is None else img + block
        s0 += ns
    return img / spp
