"""Streaming hierarchical-sweep Pallas caster for big scenes (TPU-native).

Replaces the Embree two-level traversal for large meshes
(/root/reference/src/intersection.cpp:15-44) with shapes the TPU is
actually good at: gather-free dense sweeps driven by block-granular
culling. The SAH tree is cut into clusters of C triangles
(ops/intersect_binned.build_clusters); G consecutive clusters
(spatially local — adjacent subtrees in SAH preorder) form a
"supercluster".

Two kernels:

1. LIST-DRIVEN (default): Woop table lives in HBM as (K, 16, C) —
   triangles on lanes, cluster id on the untiled leading dim — and
   listed clusters are DMA'd in double-buffered; culling runs OUTSIDE
   the kernel in dense XLA:
     - exact per-lane slab tests against every supercluster AABB,
       any-reduced per ray block  ((N, S) -> (R, S) masks);
     - a conservative interval-arithmetic "ray bundle" test of each
       block against the member cluster AABBs ((R, K), nearly free);
     - the masks compact into per-block lists of packed
       (supercluster id << G | member bitmask) words, scalar-prefetched
       into SMEM.
   The kernel's only grid dimension is ray blocks; per block it
   fori-loops over exactly the listed superclusters and dense-tests the
   bitmask'd member clusters — ZERO vector reductions or `pl.when`
   gates on vector predicates inside the loop. Measured on matpreview:
   a NOOP kernel on the round-2 (ray blocks x clusters) grid cost
   6.6 ms of per-step machinery, and each in-kernel `jnp.any` gate
   ~2.8 us; this design pays neither.

2. STREAMING (fallback when C % 128 != 0, e.g. small scenes): grid is
   (ray blocks, superclusters); each step slab-gates and streams the
   supercluster's (G*C, 12) Woop block via BlockSpec DMA.

Front-to-back early-out is traded for cull rate: the caller sorts rays
by (direction octant, origin Morton code) so each block's rays are
spatially coherent and most (block, supercluster) pairs are culled.

Padding triangles have all-zero Woop rows -> dz == 0 -> guarded out;
padding clusters have inverted AABBs (lo=+inf, hi=-inf) -> slab tests
and bundle tests never pass.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float('inf')
BLOCK_R = 1024           # rays per streaming block (lane dim)
LANE_R = 512             # rays per list-driven block (SUBLANE dim)
GROUP = 8                # clusters per supercluster
RESIDENT_BYTES = 8 << 20  # whole Woop table VMEM-resident below this
LIST_B = 256             # rays per block for the resident kernel.
                         # TPU-timed r5 (docs/PERF_LEDGER, 32768-ray
                         # bounce population): matpreview closest went
                         # 10.7 ms (512) -> 7.8 (256 alone) -> 6.4 with
                         # CPI=4 — the r4 CPU proxy that favored 512
                         # (executed-cluster counts) missed the real
                         # per-block execution cost. Smaller blocks cut
                         # union waste faster than bookkeeping grows.
CPI = 4                  # clusters per resident-sweep loop iteration
                         # (statically unrolled; use 1, 2, 4 or 8 —
                         # the break-cap refresh cadence assumes CPI | 8).
                         # TPU-timed r5: 2 -> 4 is -22% closest-bounce
                         # ms on matpreview; 8 is flat vs 4.
LIST_LEN = 192           # per-block worklist capacity (overflow ->
                         # full-K sweep for that block; keeps the SMEM
                         # prefetch footprint at R*LIST_LEN words)
INTERPRET = False        # run the Pallas kernels in interpreter mode
                         # (CPU oracle tests; production stays compiled)


# ---------------------------------------------------------------------------
# Host packing (from ops/intersect_binned.build_clusters output)
# ---------------------------------------------------------------------------

def pack_sweep(cl, group=GROUP):
    """Repack cluster data for the sweep kernel. Returns dict with
    sw_A (K*C, 12) f32 rows [a0x a1x a2x bx | ...y | ...z] per triangle,
    sw_prim (K*C, 1) f32 global tri ids (-1 pad), sw_aabb (K, 8) f32
    [lo3 hi3 0 0] per cluster, sw_saabb (K/group, 8) supercluster AABBs.
    K is padded to a multiple of `group` (padding clusters carry
    inverted AABBs so their slab test never passes)."""
    cl_A, cl_b, cl_prim = cl['cl_A'], cl['cl_b'], cl['cl_prim']
    K0, _, threeC = cl_A.shape
    C = threeC // 3
    # the resident/list lane-major kernels need triangle lanes tiled to
    # the 128-wide VREG; a non-multiple C would silently fall back to
    # the (much slower) streaming kernel for every binned scene
    assert C % 128 == 0, f"sweep cluster size {C} must be 128-aligned"
    K = -(-K0 // group) * group
    A = np.zeros((K, 3, 3, C), np.float32)
    A[:K0] = cl_A.reshape(K0, 3, 3, C)
    b = np.zeros((K, 3, C), np.float32)
    b[:K0] = cl_b.reshape(K0, 3, C)
    sw = np.zeros((K, C, 12), np.float32)
    for axis in range(3):
        sw[:, :, 4 * axis:4 * axis + 3] = A[:, :, axis, :].transpose(
            0, 2, 1)
        sw[:, :, 4 * axis + 3] = b[:, axis, :]
    aabb = np.zeros((K, 8), np.float32)
    aabb[:, 0:3] = INF
    aabb[:, 3:6] = -INF
    aabb[:K0, 0:3] = cl['cl_lo']
    aabb[:K0, 3:6] = cl['cl_hi']
    S = K // group
    saabb = np.zeros((S, 8), np.float32)
    saabb[:, 0:3] = aabb[:, 0:3].reshape(S, group, 3).min(axis=1)
    saabb[:, 3:6] = aabb[:, 3:6].reshape(S, group, 3).max(axis=1)
    prim = np.full((K, C), -1.0, np.float32)
    prim[:K0] = cl_prim.astype(np.float32)
    assert cl_prim.max(initial=0) < (1 << 24), \
        "sweep prim ids stored as f32: exact only below 2^24"
    # Lane-major copy for the list-driven kernel. VMEM pads the minor
    # (lane) dimension to 128, so keeping the row-major (K*C, 12) table
    # resident would occupy 128/12 ~ 10.7x its true size (44 MB for a
    # 90k-row mesh -> scoped-VMEM OOM), and Mosaic can only dynamically
    # index the UNTILED leading dim of a >=3D array. (K, 16, C) puts
    # triangles on LANES with cluster id as the untiled leading dim:
    # the per-cluster fetch is one (16, C) DMA — 12 Woop components +
    # the prim-id row folded in as row 12, padded to 16 sublanes for
    # DMA tiling (requires C % 128 == 0, see _call).
    lane = np.zeros((K, 16, C), np.float32)
    lane[:, :12, :] = sw.transpose(0, 2, 1)
    lane[:, 12, :] = prim
    return dict(sw_A=sw.reshape(K * C, 12),
                sw_prim=prim.reshape(K * C, 1),
                sw_lane=lane,
                sw_aabb=aabb, sw_saabb=saabb)


# ---------------------------------------------------------------------------
# XLA-side culling for the list-driven kernel
# ---------------------------------------------------------------------------

def _build_lists(scene, o, d, inv, tnear, tfar, R, B):
    """Per-block compacted cluster worklists.

    Returns (clist (R, K) i32, counts (R,) i32): clist[i, :counts[i]]
    holds cluster ids whose AABB at least one of the block's rays
    enters, ascending (preserves the SAH preorder's rough front-to-back
    coherence within the block sort order)."""
    ab = scene.sw_aabb                                     # (K, 8)
    K = ab.shape[0]
    N = o.shape[0]
    tmin = jnp.broadcast_to(tnear[:, None], (N, K))
    tmax = jnp.broadcast_to(tfar[:, None], tmin.shape)
    for ax in range(3):
        ta = (ab[None, :, ax] - o[:, ax, None]) * inv[:, ax, None]
        tb = (ab[None, :, ax + 3] - o[:, ax, None]) * inv[:, ax, None]
        tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
        tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
    mask = (tmin <= tmax).reshape(R, B, K).any(axis=1)     # (R, K)
    kid = jnp.arange(K, dtype=jnp.int32)[None, :]
    word = jnp.where(mask, kid, jnp.int32(2 ** 30))
    clist = jnp.sort(word, axis=1)
    counts = mask.sum(axis=1, dtype=jnp.int32)
    return clist, counts


def _build_lists_ftb(scene, o, d, inv, tnear, tfar, R, B, L):
    """Front-to-back per-block worklists for the resident kernel.

    Returns (clist (R, L) i32, tlist (R, L) f32, counts (R,) i32):
    cluster ids sorted by the block's earliest AABB entry distance,
    with that distance alongside — the kernel breaks out of its sweep
    once every ray's current best hit is closer than the next entry
    distance (the wavefront analogue of ordered BVH traversal,
    /root/reference/src/intersection.cpp:32 via Embree).

    A block whose cluster list overflows L degrades to SUPERCLUSTER
    granularity instead of giving up: counts = -(entered superclusters),
    clist/tlist hold supercluster ids + entry distances in the same FTB
    order, and the kernel tests all GROUP members per listed entry. The
    resident path guarantees S = K/GROUP <= 128 <= L, so the coarse list
    never overflows — every block keeps a front-to-back break (the old
    fallback swept all K clusters in id order with the break disabled,
    ~K/L-fold the work of a typical block)."""
    ab = scene.sw_aabb                                     # (K, 8)
    K = ab.shape[0]
    N = o.shape[0]
    tmin = jnp.broadcast_to(tnear[:, None], (N, K))
    tmax = jnp.broadcast_to(tfar[:, None], tmin.shape)
    for ax in range(3):
        ta = (ab[None, :, ax] - o[:, ax, None]) * inv[:, ax, None]
        tb = (ab[None, :, ax + 3] - o[:, ax, None]) * inv[:, ax, None]
        tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
        tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
    enter = (tmin <= tmax).reshape(R, B, K)
    key = jnp.min(jnp.where(enter, tmin.reshape(R, B, K), INF),
                  axis=1)                                  # (R, K)
    counts_raw = jnp.sum(jnp.any(enter, axis=1), axis=1,
                         dtype=jnp.int32)                  # (R,)
    order = jnp.argsort(key, axis=1)[:, :L].astype(jnp.int32)
    tlist = jnp.take_along_axis(key, order, axis=1)
    # supercluster-granularity fallback lists for overflow blocks
    G = GROUP
    S = K // G
    assert S <= L, f"supercluster list {S} must fit worklist cap {L}"
    key_s = key.reshape(R, S, G).min(axis=2)               # (R, S)
    counts_s = jnp.sum(key_s < INF, axis=1, dtype=jnp.int32)
    order_s = jnp.argsort(key_s, axis=1).astype(jnp.int32)  # (R, S)
    tlist_s = jnp.take_along_axis(key_s, order_s, axis=1)
    pad = ((0, 0), (0, L - S))
    order_s = jnp.pad(order_s, pad)
    tlist_s = jnp.pad(tlist_s, pad, constant_values=INF)
    over = counts_raw > L
    clist = jnp.where(over[:, None], order_s, order)
    tlist = jnp.where(over[:, None], tlist_s, tlist)
    counts = jnp.where(over, -jnp.maximum(counts_s, 1),
                       jnp.minimum(counts_raw, L))
    return clist, tlist, counts


def _kernel_res(counts_ref, clist_ref, tlist_ref, ray_ref, A_ref,
                t_o, k_o, *, C: int, L: int, any_hit: bool):
    """Resident-table sweep: the whole (K, 16, C) Woop table lives in
    VMEM, so each listed cluster is a dynamic leading-dim index — no
    DMA. Front-to-back early-break per the _build_lists_ftb order.

    Outputs only (t_best, winning cluster id): the u/v/prim extraction
    is 5 extra cross-lane reductions per cluster (~2x the whole dense
    test) and is DEFERRED to _resolve_hits, which re-tests each ray
    against just its winning cluster.

    TWO clusters per loop iteration: the round-3 anatomy measured the
    dense (128 x 128) test at ~0.6 us but ~1.5 us per loop iteration —
    the difference is loop bookkeeping (scalar list loads, dynamic-index
    setup, t_o read/modify/write, the cross-lane min). Pairing clusters
    amortizes that fixed cost over twice the useful work; an odd list
    tail re-tests its last cluster (idempotent for min-reduction)."""
    i = pl.program_id(0)
    cnt = counts_ref[i]
    over = cnt < 0
    n_it = jnp.where(over, -cnt, cnt)
    ox = ray_ref[:, 0:1]                   # (B, 1) sublane columns
    oy = ray_ref[:, 1:2]
    ozc = ray_ref[:, 2:3]
    tnear = ray_ref[:, 3:4]
    dx = ray_ref[:, 4:5]
    dy = ray_ref[:, 5:6]
    dzc = ray_ref[:, 6:7]
    tfar = ray_ref[:, 7:8]

    t_o[:] = jnp.full_like(t_o[:], INF)
    k_o[:] = jnp.full_like(k_o[:], -1.0)

    def cond(carry):
        it, tcap = carry
        tnext = tlist_ref[i, jnp.minimum(it, L - 1)]
        return (it < n_it) & (tnext <= tcap)

    def test_one(kid, lim):
        row = A_ref[kid]                                   # (16, C)

        def comp(j):
            return row[j:j + 1, :]                         # (1, C)

        def contract(c0, bias):
            r = (ox * comp(c0) + oy * comp(c0 + 1) +
                 ozc * comp(c0 + 2)
                 if bias else
                 dx * comp(c0) + dy * comp(c0 + 1) +
                 dzc * comp(c0 + 2))
            return r + comp(c0 + 3) if bias else r         # (B, C)

        oz = contract(8, True)
        dz = contract(8, False)
        safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
        t = -oz / safe_dz
        u = contract(0, True) + t * contract(0, False)
        v = contract(4, True) + t * contract(4, False)
        hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
               (u + v <= 1.0) & (t > tnear) & (t < lim))
        t = jnp.where(hit, t, INF)
        return jnp.min(t, axis=1, keepdims=True)           # (B, 1)

    def cap_refresh(pred, nbest, tcap):
        """The vector->scalar reduce feeding the break is a pipeline
        stall; refresh it only every ~8 clusters of work (the win comes
        from skipping the list TAIL, dozens of clusters deep). For
        occlusion, ANY hit decides a ray — a decided ray stops holding
        the block back entirely (-inf) instead of contributing its hit
        distance as a closest-hit cap (intersection.cpp:67-85:
        occluded() is the cheap call)."""
        val = (lambda: jnp.max(jnp.where(nbest < INF, -INF, tfar))) \
            if any_hit else (lambda: jnp.max(jnp.minimum(nbest, tfar)))
        if pred is True:
            return val()
        return jax.lax.cond(pred, val, lambda: tcap)

    def body_pairs(carry):
        # CPI statically-unrolled clusters per iteration (default 2:
        # round-3 anatomy measured per-iteration bookkeeping ~60% of a
        # pair — scalar list loads, dynamic-index setup, t_o RMW, the
        # cross-lane break reduce; unrolling amortizes it over more
        # useful work at the cost of testing up to CPI-1 clusters past
        # the break point). Result-identical for any CPI: the list
        # order is fixed, the tail duplicates its last cluster
        # (idempotent for min-reduction), and a stale break cap only
        # ever tests MORE clusters, never fewer than correctness needs.
        it, tcap = carry
        best = t_o[:]                                      # (B, 1)
        lim = jnp.minimum(best, tfar)
        tbn = None
        kwin = None
        for j in range(CPI):
            kid = clist_ref[i, jnp.minimum(it, L - 1)] if j == 0 else \
                clist_ref[i, jnp.minimum(jnp.minimum(it + j, n_it - 1),
                                         L - 1)]
            tb = test_one(kid, lim)
            if tbn is None:
                tbn, kwin = tb, kid.astype(jnp.float32)
            else:
                if not any_hit:
                    kwin = jnp.where(tb < tbn, kid.astype(jnp.float32),
                                     kwin)
                tbn = jnp.minimum(tbn, tb)
        better = tbn < best
        nbest = jnp.where(better, tbn, best)
        t_o[:] = nbest
        if not any_hit:
            k_o[:] = jnp.where(better, kwin, k_o[:])
        # refresh the break cap once per ~8 clusters (exact for CPI
        # dividing 8; see cap_refresh)
        ncap = cap_refresh(jax.lax.rem(it, 8) == (8 - CPI) % 8,
                           nbest, tcap)
        return it + CPI, ncap

    def body_super(carry):
        # overflow blocks: one SUPERCLUSTER per iteration (GROUP member
        # clusters, statically unrolled) in front-to-back order — keeps
        # the early break the old all-K fallback lost
        it, tcap = carry
        best = t_o[:]
        lim = jnp.minimum(best, tfar)
        sid = clist_ref[i, jnp.minimum(it, L - 1)]
        tbn = jnp.full_like(best, INF)
        kwin = jnp.full_like(best, -1.0)
        for g in range(GROUP):
            kid = sid * GROUP + g
            tb = test_one(kid, lim)
            if not any_hit:
                kwin = jnp.where(tb < tbn, kid.astype(jnp.float32), kwin)
            tbn = jnp.minimum(tbn, tb)
        better = tbn < best
        nbest = jnp.where(better, tbn, best)
        t_o[:] = nbest
        if not any_hit:
            k_o[:] = jnp.where(better, kwin, k_o[:])
        ncap = cap_refresh(True, nbest, tcap)   # 8 clusters/iteration
        return it + 1, ncap

    @pl.when(~over)
    def _normal():
        jax.lax.while_loop(cond, body_pairs, (jnp.int32(0), INF))

    @pl.when(over)
    def _superclusters():
        jax.lax.while_loop(cond, body_super, (jnp.int32(0), INF))


def _kernel_resolve(dcounts_ref, dlist_ref, ray_ref, kid_ref, A_ref,
                    p_o, u_o, v_o, *, C: int, D: int):
    """u/v/prim extraction for rays grouped by winning cluster: each
    128-ray block re-tests the (few) distinct clusters its rays won,
    selecting the triangle whose t is CLOSEST to the ray's t_best
    (within a small relative tolerance). Not exact equality: _kernel_res
    is a separately Mosaic-compiled program, and a different FMA /
    reassociation choice there would silently drop the hit (prim=-1
    with finite t_best -> speckle); the tolerance absorbs ulp-level
    divergence while still uniquely identifying the winner."""
    i = pl.program_id(0)
    ox = ray_ref[:, 0:1]
    oy = ray_ref[:, 1:2]
    ozc = ray_ref[:, 2:3]
    tnear = ray_ref[:, 3:4]
    dx = ray_ref[:, 4:5]
    dy = ray_ref[:, 5:6]
    dzc = ray_ref[:, 6:7]
    tbest = ray_ref[:, 7:8]
    kidv = kid_ref[:]                                      # (B, 1)

    p_o[:] = jnp.full_like(p_o[:], -1.0)
    u_o[:] = jnp.zeros_like(u_o[:])
    v_o[:] = jnp.zeros_like(v_o[:])

    def body(j, _):
        kid = dlist_ref[i, j]
        row = A_ref[kid]

        def comp(c):
            return row[c:c + 1, :]

        def contract(c0, bias):
            r = (ox * comp(c0) + oy * comp(c0 + 1) + ozc * comp(c0 + 2)
                 if bias else
                 dx * comp(c0) + dy * comp(c0 + 1) + dzc * comp(c0 + 2))
            return r + comp(c0 + 3) if bias else r

        mine = (kidv == kid.astype(jnp.float32))           # (B, 1)
        oz = contract(8, True)
        dz = contract(8, False)
        safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
        t = -oz / safe_dz
        u = contract(0, True) + t * contract(0, False)
        v = contract(4, True) + t * contract(4, False)
        hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
               (u + v <= 1.0) & (t > tnear))
        err = jnp.where(hit, jnp.abs(t - tbest), INF)
        emin = jnp.min(err, axis=1, keepdims=True)
        tol = jnp.float32(1e-4) * jnp.maximum(jnp.abs(tbest),
                                              jnp.float32(1e-6))
        sel = hit & (err == emin)
        iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        first = jnp.min(jnp.where(sel, iota, C), axis=1, keepdims=True)
        self_f = (sel & (iota == first)).astype(jnp.float32)
        pn = jnp.sum(self_f * comp(12), axis=1, keepdims=True)
        un = jnp.sum(self_f * u, axis=1, keepdims=True)
        vn = jnp.sum(self_f * v, axis=1, keepdims=True)
        take = mine & (emin <= tol)
        p_o[:] = jnp.where(take, pn, p_o[:])
        u_o[:] = jnp.where(take, un, u_o[:])
        v_o[:] = jnp.where(take, vn, v_o[:])
        return 0

    jax.lax.fori_loop(0, dcounts_ref[i], body, 0)


def _resolve_hits(scene, o, d, tnear, t_best, kid_best, K):
    """XLA wrapper for _kernel_resolve: sort rays by winning cluster so
    each block spans ~1-2 distinct clusters, build per-block distinct
    lists, run the kernel, unsort."""
    Np = o.shape[0]
    B = LIST_B
    R = Np // B
    C = scene.sw_lane.shape[2]
    kmiss = jnp.where(kid_best < 0, jnp.int32(K), kid_best)
    perm = jnp.argsort(kmiss)
    rows = jnp.concatenate(
        [o, tnear[:, None], d, t_best[:, None],
         kmiss.astype(jnp.float32)[:, None]], axis=1)      # (Np, 9)
    rows = rows[perm]
    kid_s = rows[:, 8].astype(jnp.int32).reshape(R, B)
    # distinct clusters per block (sorted order -> run starts)
    isnew = jnp.concatenate(
        [jnp.ones((R, 1), jnp.bool_), kid_s[:, 1:] != kid_s[:, :-1]],
        axis=1) & (kid_s < K)
    D = min(B, K)   # worst case: every ray in the block a distinct kid
    word = jnp.where(isnew, kid_s, jnp.int32(2 ** 30))
    dlist = jnp.sort(word, axis=1)[:, :D]
    dcounts = isnew.sum(axis=1, dtype=jnp.int32)
    rays = rows[:, :8]
    kidf = rows[:, 8:9]
    kern = functools.partial(_kernel_resolve, C=C, D=D)
    out = lambda: pl.BlockSpec((B, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)
    p, u, v = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(R,),
            in_specs=[
                pl.BlockSpec((B, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 16, C), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out(), out(), out()],
        ),
        out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.float32)] * 3,
        interpret=INTERPRET,
    )(dcounts, dlist, rays, kidf, scene.sw_lane)
    inv = jnp.argsort(perm)
    return p[inv, 0], u[inv, 0], v[inv, 0]


def _call_res(scene, o, d, tnear, tfar, any_hit):
    N = o.shape[0]
    K = scene.sw_aabb.shape[0]
    C = scene.sw_lane.shape[2]
    B = LIST_B
    pad = (-N) % B
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tnear = jnp.pad(tnear, (0, pad))
        tfar = jnp.pad(tfar, (0, pad), constant_values=-1.0)
    Np = N + pad
    R = Np // B
    L = min(LIST_LEN, K)
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    # Clamp each ray's horizon to its exit from the global geometry
    # AABB: no hit can lie beyond it, and it makes ESCAPING rays (which
    # never get a best hit) stop blocking the kernel's front-to-back
    # early-break — without this, any block containing one miss-bound
    # ray sweeps its whole worklist.
    lo = jnp.min(scene.cl_lo, axis=0)
    hi = jnp.max(scene.cl_hi, axis=0)
    ta = (lo[None, :] - o) * inv
    tb = (hi[None, :] - o) * inv
    texit = jnp.min(jnp.maximum(ta, tb), axis=1)
    tfar = jnp.minimum(tfar, texit * 1.0001 + 1e-5)
    clist, tlist, counts = _build_lists_ftb(scene, o, d, inv, tnear,
                                            tfar, R, B, L)
    rays = jnp.concatenate([o, tnear[:, None], d, tfar[:, None]],
                           axis=1)                         # (Np, 8)
    kern = functools.partial(_kernel_res, C=C, L=L, any_hit=any_hit)
    out = lambda: pl.BlockSpec((B, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)
    t, k = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(R,),
            in_specs=[
                pl.BlockSpec((B, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 16, C), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out(), out()],
        ),
        out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.float32)] * 2,
        interpret=INTERPRET,
    )(counts, clist, tlist, rays, scene.sw_lane)
    if any_hit:
        return (t[:N, 0], jnp.where(t[:N, 0] < INF, 0, -1), t[:N, 0],
                t[:N, 0])
    p, u, v = _resolve_hits(scene, o, d, tnear, t[:, 0],
                            k[:, 0].astype(jnp.int32), K)
    return (t[:N, 0], p[:N].astype(jnp.int32), u[:N], v[:N])


# ---------------------------------------------------------------------------
# List-driven resident kernel (lane-major: triangles on lanes, rays on
# sublanes — the orientation VMEM tiling actually supports at scale)
# ---------------------------------------------------------------------------

def _kernel_lane(counts_ref, clist_ref, tlist_ref, ray_ref, A_any,
                 t_o, p_o, u_o, v_o, rowbuf, rsem,
                 *, C: int, K: int, any_hit: bool):
    """HBM-streamed list sweep with a front-to-back early break.

    The break interacts with the double-buffered prefetch: a DMA issued
    for an iteration that never runs would leave its semaphore signaled
    for the NEXT grid step's reuse of the scratch. So the next row's
    fetch is issued iff the loop will actually continue, decided with
    the cap as of the PREVIOUS iteration (the break fires one cluster
    late, every issued DMA is consumed, and the fetch still overlaps
    the current row's dense test)."""
    i = pl.program_id(0)
    cnt = counts_ref[i]
    ox = ray_ref[:, 0:1]                   # (B, 1) sublane columns
    oy = ray_ref[:, 1:2]
    ozc = ray_ref[:, 2:3]
    tnear = ray_ref[:, 3:4]
    dx = ray_ref[:, 4:5]
    dy = ray_ref[:, 5:6]
    dzc = ray_ref[:, 6:7]
    tfar = ray_ref[:, 7:8]

    t_o[:] = jnp.full_like(t_o[:], INF)
    p_o[:] = jnp.full_like(p_o[:], -1.0)
    u_o[:] = jnp.zeros_like(u_o[:])
    v_o[:] = jnp.zeros_like(v_o[:])

    # The Woop table stays in HBM (VMEM lane-pads a (K*C, 12) table
    # 128/12 ~ 10.7x its true size) as (K, 16, C): Mosaic supports
    # dynamic indexing on the UNTILED leading dim, so each listed
    # cluster is one (16, C) DMA into a double-buffered scratch whose
    # fetch overlaps the previous cluster's dense test.
    def dma_row(slot, it):
        kid = clist_ref[i, jnp.minimum(it, K - 1)]
        return pltpu.make_async_copy(A_any.at[kid],
                                     rowbuf.at[slot], rsem.at[slot])

    @pl.when(cnt > 0)
    def _warmup():
        dma_row(0, 0).start()

    def cond(carry):
        _it, started, _tcap = carry
        return started

    def body(carry):
        it, _started, tcap = carry
        slot = jax.lax.rem(it, 2)
        nxt = jax.lax.rem(it + 1, 2)
        cont_next = (it + 1 < cnt) & \
            (tlist_ref[i, jnp.minimum(it + 1, K - 1)] <= tcap)

        @pl.when(cont_next)
        def _prefetch():
            dma_row(nxt, it + 1).start()

        dma_row(slot, it).wait()
        row = rowbuf[slot]                                 # (16, C)

        def comp(j):
            return row[j:j + 1, :]                         # (1, C)

        def contract(c0, bias):
            r = (ox * comp(c0) + oy * comp(c0 + 1) + ozc * comp(c0 + 2)
                 if bias else
                 dx * comp(c0) + dy * comp(c0 + 1) + dzc * comp(c0 + 2))
            return r + comp(c0 + 3) if bias else r         # (B, C)

        best = t_o[:]                                      # (B, 1)
        lim = jnp.minimum(best, tfar)
        oz = contract(8, True)
        dz = contract(8, False)
        safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
        t = -oz / safe_dz
        u = contract(0, True) + t * contract(0, False)
        v = contract(4, True) + t * contract(4, False)
        hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
               (u + v <= 1.0) & (t > tnear) & (t < lim))
        t = jnp.where(hit, t, INF)
        tbn = jnp.min(t, axis=1, keepdims=True)            # (B, 1)
        better = tbn < best
        nbest = jnp.where(better, tbn, best)
        t_o[:] = nbest
        if any_hit:
            p_o[:] = jnp.where(better, 0.0, p_o[:])
        else:
            sel = (t == tbn) & hit
            iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            first = jnp.min(jnp.where(sel, iota, C), axis=1,
                            keepdims=True)
            self_f = (sel & (iota == first)).astype(jnp.float32)
            prow = comp(12)                                # (1, C)
            pn = jnp.sum(self_f * prow, axis=1, keepdims=True)
            un = jnp.sum(self_f * u, axis=1, keepdims=True)
            vn = jnp.sum(self_f * v, axis=1, keepdims=True)
            p_o[:] = jnp.where(better, pn, p_o[:])
            u_o[:] = jnp.where(better, un, u_o[:])
            v_o[:] = jnp.where(better, vn, v_o[:])
        # cap refresh every iteration: the scalar reduce stall hides
        # under the next row's in-flight DMA. Any-hit: a decided ray
        # stops holding the block back (see _kernel_res.cap_refresh).
        if any_hit:
            ncap = jnp.max(jnp.where(nbest < INF, -INF, tfar))
        else:
            ncap = jnp.max(jnp.minimum(nbest, tfar))
        return it + 1, cont_next, ncap

    jax.lax.while_loop(cond, body, (jnp.int32(0), cnt > 0, INF))


def _call_list(scene, o, d, tnear, tfar, any_hit):
    N = o.shape[0]
    K = scene.sw_aabb.shape[0]
    C = scene.sw_A.shape[0] // K
    pad = (-N) % LANE_R
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tnear = jnp.pad(tnear, (0, pad))
        tfar = jnp.pad(tfar, (0, pad), constant_values=-1.0)
    Np = N + pad
    R = Np // LANE_R
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    # clamp horizons to the global-AABB exit so escaping rays stop
    # blocking the front-to-back break (same as _call_res)
    lo = jnp.min(scene.cl_lo, axis=0)
    hi = jnp.max(scene.cl_hi, axis=0)
    ta = (lo[None, :] - o) * inv
    tb = (hi[None, :] - o) * inv
    texit = jnp.min(jnp.maximum(ta, tb), axis=1)
    tfar = jnp.minimum(tfar, texit * 1.0001 + 1e-5)
    # full-width (L = K) front-to-back lists: no overflow possible
    clist, tlist, counts = _build_lists_ftb(scene, o, d, inv, tnear,
                                            tfar, R, LANE_R, K)
    rays = jnp.concatenate([o, tnear[:, None], d, tfar[:, None]],
                           axis=1)                         # (Np, 8)
    kern = functools.partial(_kernel_lane, C=C, K=K, any_hit=any_hit)
    out = lambda: pl.BlockSpec((LANE_R, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)
    t, p, u, v = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(R,),
            in_specs=[
                pl.BlockSpec((LANE_R, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[out(), out(), out(), out()],
            scratch_shapes=[
                pltpu.VMEM((2, 16, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(counts, clist, tlist, rays, scene.sw_lane)
    return (t[:N, 0], p[:N, 0].astype(jnp.int32), u[:N, 0], v[:N, 0])


# ---------------------------------------------------------------------------
# Streaming kernel (tables too big for VMEM)
# ---------------------------------------------------------------------------

def _kernel(oT_ref, dT_ref, invT_ref, tn_ref, tf_ref, saabb_ref, aabb_ref,
            A_ref, prim_ref, t_o, p_o, u_o, v_o, *, C: int, G: int,
            any_hit: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_o[:] = jnp.full_like(t_o[:], INF)
        p_o[:] = jnp.full_like(p_o[:], -1.0)
        u_o[:] = jnp.zeros_like(u_o[:])
        v_o[:] = jnp.zeros_like(v_o[:])

    o = oT_ref[:]                          # (3, B)
    d = dT_ref[:]
    inv = invT_ref[:]                      # precomputed 1/d (host side)
    tnear = tn_ref[:]                      # (1, B)
    tfar = tf_ref[:]

    def slab(ab, lim):
        """(1, 8) AABB row -> (1, B) enter mask against current lim."""
        tmin = tnear
        tmax = lim
        for ax in range(3):
            ta = (ab[0:1, ax:ax + 1] - o[ax:ax + 1]) * inv[ax:ax + 1]
            tb = (ab[0:1, ax + 3:ax + 4] - o[ax:ax + 1]) * inv[ax:ax + 1]
            tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
            tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
        return tmin <= tmax

    best0 = t_o[:]                         # (1, B)
    lim0 = jnp.minimum(best0, tfar)
    enter_s = slab(saabb_ref[pl.dslice(j, 1), :], lim0)
    if any_hit:
        enter_s = enter_s & (best0 == INF)

    @pl.when(jnp.any(enter_s))
    def _super():
        for g in range(G):
            # re-read the running best: earlier members of this
            # supercluster may have tightened it
            best = t_o[:]
            lim = jnp.minimum(best, tfar)
            enter = slab(aabb_ref[pl.dslice(j * G + g, 1), :], lim)
            if any_hit:
                enter = enter & (best == INF)

            @pl.when(jnp.any(enter))
            def _test(g=g, best=best, lim=lim):
                A = A_ref[g * C:(g + 1) * C, :]        # (C, 12) static

                def contract(c0, vec, bias):
                    r = (A[:, c0:c0 + 1] * vec[0:1] +
                         A[:, c0 + 1:c0 + 2] * vec[1:2] +
                         A[:, c0 + 2:c0 + 3] * vec[2:3])
                    return r + A[:, c0 + 3:c0 + 4] if bias else r

                oz = contract(8, o, True)
                dz = contract(8, d, False)
                safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
                t = -oz / safe_dz
                ox = contract(0, o, True)
                dx = contract(0, d, False)
                u = ox + t * dx
                oy = contract(4, o, True)
                dy = contract(4, d, False)
                v = oy + t * dy
                hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
                       (u + v <= 1.0) & (t > tnear) & (t < lim))
                t = jnp.where(hit, t, INF)
                tbn = jnp.min(t, axis=0, keepdims=True)     # (1, B)
                better = tbn < best
                t_o[:] = jnp.where(better, tbn, best)
                if any_hit:
                    p_o[:] = jnp.where(better, 0.0, p_o[:])
                else:
                    sel = (t == tbn) & hit
                    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                    first = jnp.min(jnp.where(sel, iota, C), axis=0,
                                    keepdims=True)
                    self_f = (sel & (iota == first)).astype(jnp.float32)
                    prim = prim_ref[g * C:(g + 1) * C, :]   # (C, 1)
                    pn = jnp.sum(self_f * prim, axis=0, keepdims=True)
                    un = jnp.sum(self_f * u, axis=0, keepdims=True)
                    vn = jnp.sum(self_f * v, axis=0, keepdims=True)
                    p_o[:] = jnp.where(better, pn, p_o[:])
                    u_o[:] = jnp.where(better, un, u_o[:])
                    v_o[:] = jnp.where(better, vn, v_o[:])


def _call_streaming(scene, o, d, tnear, tfar, any_hit):
    N = o.shape[0]
    K = scene.sw_aabb.shape[0]
    S = scene.sw_saabb.shape[0]
    G = K // S
    C = scene.sw_A.shape[0] // K
    pad = (-N) % BLOCK_R
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tnear = jnp.pad(tnear, (0, pad))
        tfar = jnp.pad(tfar, (0, pad), constant_values=-1.0)
    Np = N + pad
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    kern = functools.partial(_kernel, C=C, G=G, any_hit=any_hit)
    ray = lambda r: pl.BlockSpec((r, BLOCK_R), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM)
    t, p, u, v = pl.pallas_call(
        kern,
        grid=(Np // BLOCK_R, S),
        in_specs=[
            ray(3), ray(3), ray(3), ray(1), ray(1),
            pl.BlockSpec((S, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * C, 12), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * C, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[ray(1), ray(1), ray(1), ray(1)],
        out_shape=[jax.ShapeDtypeStruct((1, Np), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(o.T, d.T, inv.T, tnear[None, :], tfar[None, :],
      scene.sw_saabb, scene.sw_aabb, scene.sw_A, scene.sw_prim)
    return (t[0, :N], p[0, :N].astype(jnp.int32), u[0, :N], v[0, :N])


def _call(scene, o, d, tnear, tfar, any_hit):
    K = scene.sw_aabb.shape[0]
    C = scene.sw_A.shape[0] // K
    if C % 128 == 0:
        if scene.sw_lane.size * 4 <= RESIDENT_BYTES:
            return _call_res(scene, o, d, tnear, tfar, any_hit)
        return _call_list(scene, o, d, tnear, tfar, any_hit)
    return _call_streaming(scene, o, d, tnear, tfar, any_hit)


# ---------------------------------------------------------------------------
# Ray sorting (cull-rate lever; see module docstring)
# ---------------------------------------------------------------------------

def _sort_keys(scene, o, d):
    """23-bit origin Morton (major) | 3-bits-per-axis direction bin
    (minor). Origin-major ordering measured ~18% fewer block-list
    pairs than direction-octant-major on matpreview bounce rays —
    the per-block cluster union is origin-dominated."""
    lo = scene.cl_lo.min(axis=0)
    hi = scene.cl_hi.max(axis=0)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)
    q = (q * 1023.0).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | \
        (spread(q[:, 2]) << 2)
    db = jnp.clip((d + 1.0) * 3.999, 0.0, 7.0).astype(jnp.uint32)
    dirkey = (db[:, 0] << 6) | (db[:, 1] << 3) | db[:, 2]
    return ((morton >> jnp.uint32(7)) << jnp.uint32(9)) | dirkey


def _sorted_call(scene, o, d, tnear, tfar, any_hit):
    perm = jnp.argsort(_sort_keys(scene, o, d))
    out = _call(scene, o[perm], d[perm], tnear[perm], tfar[perm],
                any_hit)
    inv = jnp.argsort(perm)
    return tuple(x[inv] for x in out)


def intersect_sweep(scene, o, d, tnear, tfar):
    """Batched closest hit. Returns (t, prim, u, v) each (N,)."""
    return _sorted_call(scene, o, d, tnear, tfar, any_hit=False)


def occluded_sweep(scene, o, d, tnear, tfar):
    """Any-hit variant. Returns bool (N,)."""
    t, p, _, _ = _sorted_call(scene, o, d, tnear, tfar, any_hit=True)
    return p >= 0
