"""Window-DMA RoIAlign: a Pallas TPU kernel with zero gathers.

Replaces the gather-based pooling in ops.roi_align on the inference hot
path. Motivation (measured on v5e): XLA row gathers cost ~18 ns/row
regardless of row width, and the corner-packed design needs P*P*S*S = 196
gathered rows per RoI -> 8k proposals = 1.57M rows = ~29 ms for the gather
alone, ~77 ms for the full box pool.

TPU-first redesign:

* FPN levels are concatenated along H into ONE dense (B, Hcat, Wpad, C)
  tensor (W zero-padded to the widest level; levels shorter than the
  window zero-padded in H). No 4x corner packing.
* One grid step per RoI. The kernel DMAs the RoI's (window x window x C)
  feature patch HBM->VMEM (contiguous rows, double-buffered across grid
  steps) — fixed-size, so the copy engine streams it at full bandwidth.
* Bilinear interpolation over the patch is two small MXU matmuls with
  per-RoI "hat" weight matrices W[s, k] = relu(1 - |coord_s - k|) built in
  XLA: interpolate in y, then in x, then average the S*S sub-samples per
  bin. Hat weights reproduce ROIAlignV2 (aligned=True) corner weights
  exactly, including border clamping; out-of-range samples ([-1, size]
  rule) and adaptive sub-sample masking zero their weight rows while the
  1/(sr_y*sr_x) normalization is folded in.

Exactness: identical to ops.roi_align.roi_align_packed whenever the RoI's
sampling footprint on its assigned FPN level fits in the window (default
32). Canonically-assigned boxes have footprints <= ~15 px, but aspect
ratios stretch one axis by sqrt(aspect) (real powder data: ~2% of
particles exceed 30 px), and boxes clipped to the top pyramid level can
reach footprint 42 (full-canvas boxes on p5). Oversized footprints pool
from a 2x-avgpooled copy of their level (appended to the concat pack
for every level) — ROIAlign on a low-passed map rather than a hard
clamp; footprints beyond 2*(window-2) on the pooled copy still clamp
(requires aspect > ~20 on p2-p4: unobserved; impossible on p5).

Reference parity target: detectron2/torchvision ROIAlignV2 as exercised by
the reference via its box/mask heads (SURVEY.md §2b).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


X_ALIGN = 8  # HBM sublane tiling: DMA x-origins must be 8-aligned


_AP_VJP_CACHE = {}


def _avgpool2_edge(f):
    """2x2 mean pool with edge replication for odd extents (NHWC).

    Custom VJP (the generic reduce_window has no linearization rule on
    this path): backward is a 2x nearest upsample scaled by 0.25, with
    the edge-replicated row/col gradients folded back onto the last real
    row/col.
    """
    key = (f.shape[1] % 2, f.shape[2] % 2)
    if key not in _AP_VJP_CACHE:
        ph, pw = key

        def fwd_impl(x):
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         mode="edge")
            out = jax.lax.reduce_window(
                xp, jnp.zeros((), x.dtype), jax.lax.add,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            return out * jnp.asarray(0.25, x.dtype)

        @jax.custom_vjp
        def fn(x):
            return fwd_impl(x)

        def fn_fwd(x):
            return fwd_impl(x), ()

        def fn_bwd(_, g):
            u = jnp.repeat(jnp.repeat(g, 2, axis=1), 2, axis=2) \
                * jnp.asarray(0.25, g.dtype)
            if ph:
                u = u.at[:, -2].add(u[:, -1])[:, :-1]
            if pw:
                u = u.at[:, :, -2].add(u[:, :, -1])[:, :, :-1]
            return (u,)

        fn.defvjp(fn_fwd, fn_bwd)
        _AP_VJP_CACHE[key] = fn
    return _AP_VJP_CACHE[key](f)


def concat_feature_levels(features, *, window=32, n_downsampled=None):
    """Concatenate per-level NHWC maps along H for window pooling.

    features: list of (B, H_l, W_l, C) arrays (one per FPN level, same B/C).
    Levels are zero-padded to max(W_l) in W and to >= window in H, then
    concatenated along H, followed by a 2x-avgpooled copy of every level
    (``n_downsampled``, default all): RoIs whose sampling footprint
    exceeds the window pool from the low-passed copy at half resolution
    instead of clamping. Oversized footprints occur for elongated p2/p3
    instances (aspect > 3: ~2% of real powder particles) AND for any
    large box clipped to the top pyramid level (p5 footprints reach 42
    on a 1333-px canvas), so every level needs its pooled copy. Returns
    (concat, y_offsets, heights, widths) with static geometry tuples of
    length n_levels + n_downsampled.
    """
    if n_downsampled is None:
        n_downsampled = len(features)
    b, _, _, c = features[0].shape
    features = list(features) + [_avgpool2_edge(f)
                                 for f in features[:n_downsampled]]
    heights = tuple(int(f.shape[1]) for f in features)
    widths = tuple(int(f.shape[2]) for f in features)
    w_pad = -(-max(max(widths), window + X_ALIGN) // X_ALIGN) * X_ALIGN
    parts = []
    y_off = []
    off = 0
    for f, h, w in zip(features, heights, widths):
        hp = max(h, window)
        parts.append(jnp.pad(f, ((0, 0), (0, hp - h), (0, w_pad - w),
                                 (0, 0))))
        y_off.append(off)
        off += hp
    return (jnp.concatenate(parts, axis=1), tuple(y_off), heights, widths)


def _axis_weights(lo, hi, size, size_pad, *, P, S, window, align=1,
                  win_eff=None):
    """Per-RoI hat weight matrix for one axis.

    lo/hi: (N,) box extent in level coords (already scaled, -0.5 shifted);
    size: (N,) true level extent; size_pad: (N,) padded extent in the
    concat tensor; align: origin alignment (the window must absorb
    ``align - 1`` extra columns when > 1); win_eff: optional (N,) int32
    per-RoI effective DMA extent (two-tier pooling) used for the origin
    clamp — the weight grid width stays ``window``. Returns
    (w (N, P*S, window) f32, origin (N,) int32).
    """
    span = hi - lo
    bin_sz = span / P
    sr = jnp.clip(jnp.ceil(span / P), 1, S).astype(jnp.int32)
    pbin = jnp.arange(P, dtype=jnp.float32)
    ssub = jnp.arange(S, dtype=jnp.float32)
    # sample coords, (N, P, S), ordered (bin, sub-sample)
    coords = (lo[:, None, None] + pbin[None, :, None] * bin_sz[:, None, None]
              + (ssub[None, None, :] + 0.5) * bin_sz[:, None, None]
              / sr[:, None, None].astype(jnp.float32))
    used = (ssub[None, None, :] < sr[:, None, None])
    in_range = (coords >= -1.0) & (coords <= size[:, None, None])
    sizef = size.astype(jnp.float32)
    cl = jnp.clip(coords, 0.0, (sizef - 1.0)[:, None, None])
    clamp = size_pad - (window if win_eff is None else win_eff)
    origin = jnp.clip(jnp.floor(cl.min(axis=(1, 2))).astype(jnp.int32),
                      0, clamp)
    if align > 1:
        origin = (origin // align) * align
    rel = jnp.clip(cl - origin.astype(jnp.float32)[:, None, None],
                   0.0, window - 1.0)
    mask = used & in_range
    grid = jnp.arange(window, dtype=jnp.float32)
    w = jnp.maximum(
        0.0, 1.0 - jnp.abs(rel[..., None] - grid[None, None, None, :]))
    w = w * (mask.astype(jnp.float32)
             / sr.astype(jnp.float32)[:, None, None])[..., None]
    # the S sub-samples only ever enter downstream through their average,
    # which is linear — fold the sub-sample sum into the weight matrix
    # ((N, P, S, window) -> (N, P, window)), shrinking the kernel matmuls
    # S-fold in M and S^2-fold in the x-contraction
    return w.sum(axis=2), origin


@partial(jax.jit, static_argnames=("strides", "heights", "widths",
                                   "y_offsets", "output_size", "max_sr",
                                   "window", "small_window"))
def _prepare(boxes, img_idx, levels, valid, *, strides, heights, widths,
             y_offsets, output_size, max_sr, window, small_window=None):
    """XLA-side per-RoI prep: origins (N, 4) int32 + hat weights.

    Geometry tuples carry 2L entries: L original levels then their
    2x-avgpooled copies. RoIs whose footprint exceeds the window are
    demoted to the pooled copy of their level (coords c -> (c - 0.5) / 2:
    a pooled cell's center sits at 2j + 0.5 original pixel-center units),
    turning the hard clamp into a low-pass approximation.

    ``small_window``: optional two-tier DMA extent. RoIs whose footprint
    fits in small_window - 2 get origins[:, 3] = 1 and an origin clamp
    matching the smaller DMA (the kernel then moves a
    (small_window, small_window + X_ALIGN) patch instead of the full
    window — e.g. 3.3x less HBM traffic at 16 vs 32). Exactness is
    unchanged: the weight grid stays ``window`` wide and the smaller
    window fully covers the RoI's sampling support.
    """
    n_lvl = len(strides)
    n_ds = len(heights) - n_lvl
    assert n_ds > 0, "pack must include downsampled levels"
    strides_a = jnp.asarray(strides, jnp.float32)
    heights_a = jnp.asarray(heights, jnp.int32)
    widths_a = jnp.asarray(widths, jnp.int32)
    yoff_a = jnp.asarray(y_offsets, jnp.int32)
    hpad = tuple(max(h, window) for h in heights)
    hpad_a = jnp.asarray(hpad, jnp.int32)
    xwin = window + X_ALIGN
    wpad = -(-max(max(widths), xwin) // X_ALIGN) * X_ALIGN

    scale = 1.0 / strides_a[levels]
    x0 = boxes[:, 0] * scale - 0.5
    y0 = boxes[:, 1] * scale - 0.5
    x1 = boxes[:, 2] * scale - 0.5
    y1 = boxes[:, 3] * scale - 0.5
    P, S = output_size, max_sr

    span = jnp.maximum(x1 - x0, y1 - y0)
    demote = (span > window - 2.0) & (levels < n_ds)
    entry = levels + jnp.where(demote, n_lvl, 0)
    x0, x1, y0, y1 = (jnp.where(demote, (c - 0.5) * 0.5, c)
                      for c in (x0, x1, y0, y1))

    if small_window is not None:
        span = jnp.maximum(x1 - x0, y1 - y0)   # post-demotion footprint
        small = span <= small_window - 2.0
        wy_eff = jnp.where(small, small_window, window)
        wx_eff = jnp.where(small, small_window + X_ALIGN, xwin)
    else:
        small = jnp.zeros_like(levels)
        wy_eff = wx_eff = None

    wy, oy = _axis_weights(y0, y1, heights_a[entry], hpad_a[entry],
                           P=P, S=S, window=window, win_eff=wy_eff)
    wx, ox = _axis_weights(x0, x1, widths_a[entry],
                           jnp.full_like(levels, wpad), P=P, S=S,
                           window=xwin, align=X_ALIGN, win_eff=wx_eff)
    v = valid.astype(jnp.float32)[:, None, None]
    origins = jnp.stack(
        [img_idx.astype(jnp.int32), yoff_a[entry] + oy, ox,
         small.astype(jnp.int32)], axis=1)
    return origins, wy * v, wx * v


N_BUF = 4   # DMA pipeline depth: window groups prefetched N_BUF - 1 ahead
GROUP = 4   # RoIs per grid step (amortizes per-step pipeline overhead)
# (GROUP=8/N_BUF=3 measured identical end-to-end on v5e: 110.36 vs
# 110.32 img/s — the issue floor is per-DMA, not per-grid-step.)


def _roi_window_kernel(org_ref, feat_ref, wy_ref, wx_ref, out_ref,
                       win_scratch, sems, *, window, xwin, P, S, C,
                       n_buf=N_BUF, small_window=None):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    two_tier = small_window is not None
    sxwin = (small_window + X_ALIGN) if two_tier else None

    def copy(step, g, small):
        slot = jax.lax.rem(step, n_buf)
        roi = step * GROUP + g
        img = org_ref[roi, 0]
        ya = org_ref[roi, 1]
        xa = pl.multiple_of(org_ref[roi, 2], X_ALIGN)
        if small:
            # two-tier fast path: the RoI's sampling support fits in the
            # small patch; rows/cols beyond it carry zero hat weights, so
            # the stale scratch contents there never contribute (scratch
            # is zero-initialized once at step 0 so they are finite).
            return pltpu.make_async_copy(
                feat_ref.at[img, pl.ds(ya, small_window),
                            pl.ds(xa, sxwin), :],
                win_scratch.at[slot, g, :small_window, :sxwin],
                sems.at[slot, g])
        return pltpu.make_async_copy(
            feat_ref.at[img, pl.ds(ya, window), pl.ds(xa, xwin), :],
            win_scratch.at[slot, g], sems.at[slot, g])

    def start(step, g):
        if not two_tier:
            copy(step, g, False).start()
            return
        sm = org_ref[step * GROUP + g, 3]

        @pl.when(sm == 1)
        def _():
            copy(step, g, True).start()

        @pl.when(sm == 0)
        def _():
            copy(step, g, False).start()

    def wait(step, g):
        if not two_tier:
            copy(step, g, False).wait()
            return
        sm = org_ref[step * GROUP + g, 3]

        @pl.when(sm == 1)
        def _():
            copy(step, g, True).wait()

        @pl.when(sm == 0)
        def _():
            copy(step, g, False).wait()

    @pl.when(i == 0)
    def _():
        if two_tier:
            win_scratch[...] = jnp.zeros(win_scratch.shape,
                                         win_scratch.dtype)
        for j in range(n_buf - 1):
            @pl.when(j < n)
            def _():
                for g in range(GROUP):
                    start(j, g)

    @pl.when(i + n_buf - 1 < n)
    def _():
        for g in range(GROUP):
            start(i + n_buf - 1, g)

    for g in range(GROUP):
        wait(i, g)
        win = win_scratch[jax.lax.rem(i, n_buf), g].astype(jnp.float32)
        # y interp+average: (P, window) @ (window, xwin*C)
        a = jnp.dot(wy_ref[g], win.reshape(window, xwin * C),
                    preferred_element_type=jnp.float32)
        # x interp+average: contract the window-x axis -> (P_x, P_y, C)
        bx = jax.lax.dot_general(
            wx_ref[g], a.reshape(P, xwin, C),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[g] = bx.transpose(1, 0, 2).astype(out_ref.dtype)


def roi_align_windows(concat_pack, boxes, img_idx, levels, valid, *,
                      strides, output_size=7, max_sr=2, window=32,
                      interpret=None, trainable=False, small_window=None):
    """Pool N boxes into (N, P, P, C) with the window-DMA Pallas kernel.

    concat_pack: output of concat_feature_levels (with static geometry);
    boxes: (N, 4) XYXY image coords; img_idx: (N,) int32; levels: (N,)
    int32 FPN level index; valid: (N,) bool (invalid rows pool to zero);
    strides: static per-level stride tuple. With ``trainable`` the call
    carries a feature gradient (custom VJP: per-RoI window gradients
    scatter-added into the feature plane); boxes must then already be
    stop-gradient (detectron2 semantics: proposals do not backprop into
    the RPN through the heads).

    ``small_window`` enables two-tier DMA: RoIs whose level footprint
    fits in small_window - 2 (canonical FPN assignment puts boxes under
    ~56 px image-size there — the vast majority in dense SEM workloads)
    move a 3.3x smaller HBM patch with identical results (exactness test:
    tests/test_roi_align_fused.py::test_two_tier_matches_single_tier).
    Default OFF: end-to-end on v5e the per-RoI conditional DMA measured
    ~3% slower than always moving the full window (94.4 -> 91.2 img/s on
    the flagship bench) — the pooling floor is DMA *issue* rate, not HBM
    bandwidth, and the two predicated copies per RoI double the issue
    cost. Ignored when ``trainable`` (the backward scatter uses
    full-window origins).
    """
    concat, y_offsets, heights, widths = concat_pack
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = boxes.shape[0]
    P, S = output_size, max_sr
    xwin = window + X_ALIGN
    if trainable or (small_window is not None and small_window >= window):
        small_window = None

    origins, wy, wx = _prepare(
        boxes, img_idx, levels, valid, strides=strides, heights=heights,
        widths=widths, y_offsets=y_offsets, output_size=P, max_sr=S,
        window=window, small_window=small_window)
    if trainable:
        origins = jax.lax.stop_gradient(origins)
        wy = jax.lax.stop_gradient(wy)
        wx = jax.lax.stop_gradient(wx)

    pad = (-n) % GROUP
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))

    if trainable:
        out = _pooled_trainable(origins, concat, wy, wx, P, S, window,
                                xwin, interpret, tuple(concat.shape),
                                str(concat.dtype))
    else:
        out = _pooled_call(origins, concat, wy, wx, P=P, S=S,
                           window=window, xwin=xwin, interpret=interpret,
                           small_window=small_window)
    return out[:n] if pad else out


def _pooled_call(origins, concat, wy, wx, *, P, S, window, xwin,
                 interpret, small_window=None):
    n_pad = origins.shape[0]
    C = concat.shape[3]
    # Scratch is n_buf*GROUP*window*xwin*C*itemsize (~10.5 MB for the
    # validated bf16 config); halve the pipeline depth for 4-byte feature
    # dtypes so f32 models stay within the same VMEM budget instead of
    # dying with an opaque Mosaic overflow.
    n_buf = N_BUF if jnp.dtype(concat.dtype).itemsize <= 2 \
        else max(2, N_BUF // 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pad // GROUP,),
        in_specs=[
            # origins stay whole in VMEM: SMEM prefetch pads each scalar to
            # 128 B, overflowing SMEM for thousands of RoIs
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((GROUP, P, window), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP, P, xwin), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP, P, P, C), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_buf, GROUP, window, xwin, C), concat.dtype),
            pltpu.SemaphoreType.DMA((n_buf, GROUP)),
        ],
    )
    kernel = partial(_roi_window_kernel, window=window, xwin=xwin, P=P, S=S,
                     C=C, n_buf=n_buf, small_window=small_window)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, P, P, C), concat.dtype),
        interpret=interpret,
    )(origins, concat, wy, wx)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _pooled_trainable(origins, concat, wy, wx, P, S, window, xwin,
                      interpret, cshape, cdtype):
    """Differentiable (w.r.t. ``concat``) window pooling.

    The pooled output is bilinear in the features: out[n, py, px, c] =
    sum_vw Wy[n, py, v] Wx[n, px, w] win_n[v, w, c], so the feature
    cotangent is the transpose — per-RoI window gradients built by two
    batched einsums, scatter-added into the concat plane at the DMA
    origins. Hat weights / origins derive from (stop-gradient) boxes and
    carry no gradient. cshape/cdtype are concat's static shape and dtype
    name (custom_vjp residuals must be JAX types).
    """
    return _pooled_call(origins, concat, wy, wx, P=P, S=S, window=window,
                        xwin=xwin, interpret=interpret)


def _pooled_fwd(origins, concat, wy, wx, P, S, window, xwin, interpret,
                cshape, cdtype):
    out = _pooled_call(origins, concat, wy, wx, P=P, S=S, window=window,
                       xwin=xwin, interpret=interpret)
    return out, (origins, wy, wx)


def _pooled_bwd(P, S, window, xwin, interpret, cshape, cdtype, res, g):
    origins, wy, wx = res
    g32 = g.astype(jnp.float32)
    # x-transpose then y-transpose of the forward interpolation
    t = jnp.einsum("nxw,nyxc->nywc", wx, g32)       # (N, P, xwin, C)
    u = jnp.einsum("nyv,nywc->nvwc", wy, t)         # (N, window, xwin, C)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2))
    dcat = jax.lax.scatter_add(
        jnp.zeros(cshape, jnp.float32), origins[:, :3], u, dnums)

    def zero(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    return (zero(origins), dcat.astype(cdtype), zero(wy), zero(wx))


_pooled_trainable.defvjp(_pooled_fwd, _pooled_bwd)


def roi_align_windows_trainable(concat_pack, boxes, img_idx, levels, valid,
                                **kwargs):
    """Back-compat alias for roi_align_windows(..., trainable=True)."""
    return roi_align_windows(concat_pack, boxes, img_idx, levels, valid,
                             trainable=True, **kwargs)
