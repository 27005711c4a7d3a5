"""Ray-primitive intersection (device side).

Replaces the Embree calls behind intersect()/occluded()
(src/intersection.cpp:7-85). All functions are written per-ray
(scalar-style) and vmapped into the wavefront by callers; XLA turns the
batched version into pure SoA vector code on the VPU.

Conventions (matching Embree's, so downstream shading math carries over):
hit point = (1-u-v)*v0 + u*v1 + v*v2; triangles tested with
Moller-Trumbore; spheres with the numerically-stable quadratic
(src/shapes/sphere.inl:15-38).
"""

from functools import partial

import jax
import jax.numpy as jnp

from lajolla_tpu.core.math import cross, dot

INF = jnp.float32(jnp.inf)


def ray_triangle(o, d, p0, e1, e2, tnear, tfar):
    """Moller-Trumbore. Returns (t, u, v, hit) — scalars (or batched over
    triangle arrays if p0/e1/e2 carry a leading axis)."""
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    # No backface culling (Embree default). Guard near-zero determinant.
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - p0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
           (u + v <= 1.0) & (t > tnear) & (t < tfar))
    return t, u, v, hit


def ray_sphere(o, d, center, radius, tnear, tfar):
    """Numerically-stable sphere quadratic; returns (t, hit) for the
    nearest root in (tnear, tfar)."""
    oc = o - center
    a = dot(d, d)
    b = 2.0 * dot(oc, d)
    c = dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    valid = disc >= 0.0
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * jnp.where(b >= 0.0, b + sqrt_disc, b - sqrt_disc)
    safe = lambda num, den: jnp.where(jnp.abs(den) > 1e-30, num / jnp.where(
        jnp.abs(den) > 1e-30, den, 1.0), INF)
    t0 = safe(q, a)
    t1 = safe(c, q)
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    t = jnp.where((tlo > tnear) & (tlo < tfar), tlo,
                  jnp.where((thi > tnear) & (thi < tfar), thi, INF))
    hit = valid & (t < INF)
    return jnp.where(hit, t, INF), hit


# ---------------------------------------------------------------------------
# Brute-force intersectors (small scenes; also the BVH reference oracle)
# ---------------------------------------------------------------------------

def _brute_force_scalar(scene, o, d, tnear, tfar):
    """Closest hit over ALL triangles (vectorized over the T axis).
    Returns (t, prim_id, u, v). prim_id = -1 on miss."""
    t, u, v, hit = ray_triangle(o[None, :], d[None, :],
                                scene.tri_p0, scene.tri_e1, scene.tri_e2,
                                tnear, tfar)
    t = jnp.where(hit, t, INF)
    i = jnp.argmin(t)
    t_best = t[i]
    miss = t_best == INF
    return (jnp.where(miss, INF, t_best),
            jnp.where(miss, -1, i).astype(jnp.int32),
            u[i], v[i])


def _brute_force_batched(scene, o, d, tnear, tfar):
    """MXU formulation: Woop unit-triangle transforms turn the ray set-up
    into two (N,3)x(3,3Tc) matmuls, then cheap elementwise resolve.
    o, d: (N,3); tnear/tfar: (N,) or scalar. Exact fp32 (HIGHEST).

    Operates on the quad-merged CAST table (scene/compile.py
    _merge_parallelograms): prims flagged in cast_quad accept the full
    parallelogram max(u, v) <= 1; a hit with u + v > 1 lies in the
    partner triangle and maps exactly to its barycentrics
    (u', v') = (1 - v, u + v - 1)."""
    T = scene.tri_woop_A.shape[1] // 3
    hp = jax.lax.Precision.HIGHEST
    op = jnp.dot(o, scene.tri_woop_A, precision=hp) + scene.tri_woop_b
    dp = jnp.dot(d, scene.tri_woop_A, precision=hp)
    ox, oy, oz = op[:, :T], op[:, T:2 * T], op[:, 2 * T:]
    dx, dy, dz = dp[:, :T], dp[:, T:2 * T], dp[:, 2 * T:]
    safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
    t = -oz / safe_dz
    u = ox + t * dx
    v = oy + t * dy
    if jnp.ndim(tnear) == 1:
        tnear = tnear[:, None]
    if jnp.ndim(tfar) == 1:
        tfar = tfar[:, None]
    lim = jnp.where(scene.cast_quad[None, :] > 0,
                    1.0 - jnp.maximum(u, v), 1.0 - u - v)
    hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
           (lim >= 0.0) & (t > tnear) & (t < tfar))
    t = jnp.where(hit, t, INF)
    i = jnp.argmin(t, axis=1)
    rows = jnp.arange(o.shape[0])
    t_best = t[rows, i]
    miss = t_best == INF
    ui, vi = u[rows, i], v[rows, i]
    back = (scene.cast_quad[i] > 0) & (ui + vi > 1.0)
    prim = jnp.where(back, scene.cast_alt[i], scene.cast_src[i])
    ur = jnp.where(back, 1.0 - vi, ui)
    vr = jnp.where(back, ui + vi - 1.0, vi)
    return (jnp.where(miss, INF, t_best),
            jnp.where(miss, -1, prim).astype(jnp.int32),
            ur, vr)


def _occluded_batched(scene, o, d, tnear, tfar):
    """Any-hit over the OCCLUDER SUBSET (convex-envelope tris can never
    block a shadow segment; scene/compile.py tri_woop_*_occ)."""
    A, bvec = scene.tri_woop_A_occ, scene.tri_woop_b_occ
    T = A.shape[1] // 3
    hp = jax.lax.Precision.HIGHEST
    op = jnp.dot(o, A, precision=hp) + bvec
    dp = jnp.dot(d, A, precision=hp)
    ox, oy, oz = op[:, :T], op[:, T:2 * T], op[:, 2 * T:]
    dx, dy, dz = dp[:, :T], dp[:, T:2 * T], dp[:, 2 * T:]
    safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
    t = -oz / safe_dz
    u = ox + t * dx
    v = oy + t * dy
    lim = jnp.where(scene.cast_occ_quad[None, :] > 0,
                    1.0 - jnp.maximum(u, v), 1.0 - u - v)
    hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
           (lim >= 0.0) & (t > tnear[:, None]) & (t < tfar[:, None]))
    return hit.any(axis=1)


@jax.custom_batching.custom_vmap
def brute_force_triangles(scene, o, d, tnear, tfar):
    return _brute_force_scalar(scene, o, d, tnear, tfar)


def _on_tpu():
    import jax.extend.backend
    return jax.default_backend() == 'tpu'


def _bcast_ray_args(axis_size, in_batched, o, d, tnear, tfar):
    _, o_b, d_b, tn_b, tf_b = in_batched
    if not o_b:
        o = jnp.broadcast_to(o, (axis_size, 3))
    if not d_b:
        d = jnp.broadcast_to(d, (axis_size, 3))
    if not tn_b:
        tnear = jnp.broadcast_to(jnp.asarray(tnear, jnp.float32),
                                 (axis_size,))
    if not tf_b:
        tfar = jnp.broadcast_to(jnp.asarray(tfar, jnp.float32),
                                (axis_size,))
    return o, d, tnear, tfar


@brute_force_triangles.def_vmap
def _brute_force_vmap_rule(axis_size, in_batched, scene, o, d, tnear, tfar):
    o, d, tnear, tfar = _bcast_ray_args(axis_size, in_batched, o, d,
                                        tnear, tfar)
    if scene.meta.use_binned:
        if _on_tpu():
            from lajolla_tpu.ops.intersect_sweep import intersect_sweep
            out = intersect_sweep(scene, o, d, tnear, tfar)
        else:
            from lajolla_tpu.ops.intersect_binned import intersect_binned
            out = intersect_binned(scene, o, d, tnear, tfar)
    elif _on_tpu():
        from lajolla_tpu.ops.intersect_pallas import intersect_brute_pallas
        out = intersect_brute_pallas(scene, o, d, tnear, tfar)
    else:
        out = _brute_force_batched(scene, o, d, tnear, tfar)
    return out, (True, True, True, True)


@jax.custom_batching.custom_vmap
def occluded_brute(scene, o, d, tnear, tfar):
    """Any-hit over all triangles (scalar form)."""
    t, prim, _, _ = _brute_force_scalar(scene, o, d, tnear, tfar)
    return prim >= 0


@occluded_brute.def_vmap
def _occluded_vmap_rule(axis_size, in_batched, scene, o, d, tnear, tfar):
    o, d, tnear, tfar = _bcast_ray_args(axis_size, in_batched, o, d,
                                        tnear, tfar)
    if scene.meta.use_binned:
        if _on_tpu():
            from lajolla_tpu.ops.intersect_sweep import occluded_sweep
            out = occluded_sweep(scene, o, d, tnear, tfar)
        else:
            from lajolla_tpu.ops.intersect_binned import occluded_binned
            out = occluded_binned(scene, o, d, tnear, tfar)
    elif _on_tpu():
        from lajolla_tpu.ops.intersect_pallas import occluded_brute_pallas
        out = occluded_brute_pallas(scene, o, d, tnear, tfar)
    else:
        out = _occluded_batched(scene, o, d, tnear, tfar)
    return out, True


def brute_force_spheres(scene, o, d, tnear, tfar):
    """Closest hit over all spheres. Returns (t, sphere_idx)."""
    t, hit = ray_sphere(o[None, :], d[None, :],
                        scene.sph_center, scene.sph_radius, tnear, tfar)
    t = jnp.where(hit, t, INF)
    i = jnp.argmin(t)
    t_best = t[i]
    miss = t_best == INF
    return jnp.where(miss, INF, t_best), jnp.where(miss, -1, i).astype(jnp.int32)
