"""
Pallas kernel: one full year of ClimateUDEB monthly sub-steps in VMEM.

Why a kernel: at ensemble scale the XLA month scan is HBM-bound — every
monthly implicit column solve materializes its coefficient arrays
(a, b, c, d, the sweep intermediates, the diffusivity profile) as
``(B, 2, 50)`` HBM tensors, ~10 round trips of ~40 MB each per month at
100k members (~1.3 TB over a 550-year run).  This kernel performs all 12
monthly sub-steps for a batch tile entirely on-chip: the ocean columns,
land/ground temperatures, hemispheric exchange and upwelling state are
read from HBM once per year, every intermediate lives in VMEM/registers,
and the updated state is written back once.

Physics is a line-for-line transcription of the traced month loop in
``rscm_tpu/magicc/climate/udeb.py`` (``month_step``/``step_ocean_columns``
— itself a mirror of the reference's ``udeb/mod.rs`` monthly update) with
a trailing lane axis for the batch tile.  Differential tests drive whole
models through both engines (``tests/test_udeb_pallas.py``).

Layout: members tile a full ``(TILE_SUB, TILE_LANES)`` = (8, 256) VPU
granule block (sublanes AND lanes), so every per-(hemisphere, layer) row
op is granule-dense; layers index the leading block rows.  Per-member
scalars arrive packed as one ``(S, 8, B/8)`` array so the kernel
signature stays small; static geometry (area factors, layer spacing, box
fractions) is closed over as compile-time float literals.

Batching: the component's solve runs per-member under ``vmap``; a
``jax.custom_batching.custom_vmap`` wrapper routes the batched call to
the tiled kernel (and implements the unbatched primal as a batch of 1).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

__all__ = ["udeb_year_update", "UdebStatic", "SCALAR_ROWS"]

#: packed per-member scalar rows, in order (see _pack_scalars)
SCALAR_ROWS = (
    "lam_o", "lam_l", "kappa", "kappa_dkdt", "kappa_min",
    "w_initial", "w_var_frac", "k_lo", "k_ns", "k_lg",
    "amplify", "pi_ratio", "adj_alpha", "adj_gamma", "max_temp",
    "c_ground", "erf_start", "erf_end", "t_polar",
)
S = len(SCALAR_ROWS)

#: batch-tile geometry: members map to a full (8 sublane, TILE_LANES lane)
#: VPU tile, so every per-(hemisphere, layer) row op is granule-dense.
#: The previous layout kept members on lanes only — per-layer rows were
#: (2, 512), using 2 of 8 sublanes (25% VPU efficiency); with the member
#: sublane axis each row op is (2, 8, L) = fully-packed granules.
#: Measured (100k x 251-yr MAGICC ensemble, TPU v5e): whole-model wall
#: 3.31 s -> 1.58 s, i.e. the kernel's share dropped ~8x (1.97 s ->
#: ~0.25 s; bigger tiles also cut per-op overhead 8x).
#: (8, 512) tiles exceed the 16 MB scoped-VMEM limit (18.8 MB with the
#: month body's live temporaries); (8, 256) fits with double buffering.
TILE_SUB = 8
TILE_LANES = 256
TILE_B = TILE_SUB * TILE_LANES


@dataclass(frozen=True)
class UdebStatic:
    """Compile-time configuration shared by kernel and caller."""

    n: int
    steps: int
    dt_sub: float
    dz: float
    dz_mix: float
    c_mix: float
    af_top: tuple
    af_bot: tuple
    af_diff: tuple
    relative_depth: tuple
    inv_dz_dzup: tuple
    f_l: tuple  # (2,) land fraction per hemisphere (of the half-globe)
    fg: tuple  # (fgno, fgnl, fgso, fgsl) global box fractions
    qfrac: tuple  # (4,) regional CO2 forcing fractions
    diffusivity_scale: float
    land_heat_enabled: bool


def _month_body(st: UdebStatic, jnp, jax, scal, ocean, land, ground, hemi,
                upwell, alpha_eff, init_prof, frac):
    """One monthly sub-step on (2, n, T)/(2, T) tiles; returns new state.

    Pallas kernels may not capture array constants, so every static
    vector (area factors, layer geometry, hemisphere fractions) enters as
    Python-float literals: layer-dependent coefficients are unrolled
    per-row, hemisphere-dependent ones use an iota mask.
    """
    n = st.n
    dz, dz_mix = st.dz, st.dz_mix
    dz1 = dz / 2.0
    dt_sub = st.dt_sub
    c_mix = st.c_mix
    fgno, fgnl, fgso, fgsl = st.fg
    f_l0, f_l1 = st.f_l
    f_o0, f_o1 = 0.5 - f_l0, 0.5 - f_l1
    af_top = [float(v) for v in st.af_top]
    af_bot = [float(v) for v in st.af_bot]
    af_diff = [float(v) for v in st.af_diff]
    rel_depth = [float(v) for v in st.relative_depth]
    inv_dz_dzup = [float(v) for v in st.inv_dz_dzup]
    q0, q1, q2, q3 = st.qfrac

    # hemisphere selector, shape (2, 1, ...) matching the member dims:
    # literals only, no captured consts.  The body is shape-polymorphic in
    # the trailing member axes — (T,) rows in the jnp reference path,
    # (TILE_SUB, L) granule-dense tiles in the kernel.
    member_ndim = ocean.ndim - 2
    hemi0 = (
        jax.lax.broadcasted_iota(jnp.int32, (2,) + (1,) * member_ndim, 0) == 0
    )

    def per_hemi(a, b):
        return jnp.where(hemi0, a, b)

    f_l_c = per_hemi(f_l0, f_l1)
    f_o_c = per_hemi(f_o0, f_o1)

    # unpack scalar rows: each (T,)
    sc = {name: scal[i] for i, name in enumerate(SCALAR_ROWS)}

    # efficacy scaling is folded into erf_start/erf_end by the caller
    erf = sc["erf_start"] + frac * (sc["erf_end"] - sc["erf_start"])

    # -- ground-heat damping ------------------------------------------------
    if st.land_heat_enabled:
        flux = sc["k_lg"] * (land - ground)  # (2, T)
        safe_fl = per_hemi(f_l0 if f_l0 >= 1e-15 else 1.0,
                           f_l1 if f_l1 >= 1e-15 else 1.0)
        delta_ground = flux / (safe_fl * sc["c_ground"]) * dt_sub
        ground = ground + jnp.where(
            f_l_c < 1e-15, jnp.zeros_like(delta_ground), delta_ground
        )

    # -- implicit ocean column update (both hemispheres) --------------------
    w = upwell  # (2, T)
    ocean_forcing = jnp.stack([erf * q0, erf * q2])  # (2, T) NO/SO boxes

    t_top = ocean[:, 0]  # (2, T)
    t_bottom = ocean[:, n - 1]
    dkdt_term = sc["kappa_dkdt"] * (t_top - t_bottom)  # (2, T)
    kappa_rows = [
        jnp.maximum(
            ((1.0 - rel_depth[i]) * dkdt_term + sc["kappa"])
            * st.diffusivity_scale,
            sc["kappa_min"],
        )
        for i in range(n - 1)
    ]  # each (2, T)

    denominator = f_o_c * (sc["k_lo"] + f_l_c * sc["lam_l"])  # (2, T)
    term_feedback = alpha_eff / c_mix * (
        sc["lam_o"]
        + sc["lam_l"] * sc["k_lo"] * sc["amplify"] * f_l_c / denominator
    )
    term_diff0 = kappa_rows[0] / (dz_mix * dz1) * dt_sub  # (2, T)
    term_upwell0 = w / dz_mix * dt_sub
    forcing_amp = 1.0 + sc["k_lo"] * f_l_c / denominator
    term_upwell_layer = w / dz * dt_sub  # (2, T)

    delta_w = w - sc["w_initial"][None]  # (2, members...)
    t_polar = sc["t_polar"][None]  # (1, members...)

    # row 0 (mixed layer)
    b0 = (
        1.0
        + term_feedback * dt_sub * af_top[0]
        + term_diff0 * af_bot[0]
        + term_upwell0 * sc["pi_ratio"] * af_bot[0]
    )
    c0 = -(term_diff0 + term_upwell0) * af_bot[0]
    d0 = ocean[:, 0] + (ocean_forcing * forcing_amp + hemi) / c_mix * dt_sub * af_top[0]
    if st.land_heat_enabled:
        d0 = d0 - sc["k_lg"] * (land - ground) / (c_mix * f_o_c) * dt_sub * af_top[0]
    d0 = d0 + dt_sub / dz_mix * delta_w * (init_prof[:, 1] - t_polar) * af_bot[0]

    a_rows = [jnp.zeros_like(b0)]
    b_rows = [b0]
    c_rows = [c0]
    d_rows = [d0]

    # interior rows 1..n-2, unrolled with literal coefficients
    ocean0 = ocean[:, 0]
    for i in range(1, n - 1):
        dz_up_inv = inv_dz_dzup[i - 1]
        t_diff_up = kappa_rows[i - 1] * dz_up_inv * dt_sub
        t_diff_down = kappa_rows[i] / (dz * dz) * dt_sub
        a_rows.append(-t_diff_up * af_top[i])
        b_rows.append(
            1.0
            + t_diff_up * af_top[i]
            + t_diff_down * af_bot[i]
            + term_upwell_layer * af_top[i]
        )
        c_rows.append(-(t_diff_down + term_upwell_layer) * af_bot[i])
        d_i = ocean[:, i] + sc["pi_ratio"] * term_upwell_layer * ocean0 * af_diff[i]
        d_i = d_i + dt_sub / dz * delta_w * (
            init_prof[:, i + 1] * af_bot[i] - init_prof[:, i] * af_top[i]
        )
        d_i = d_i + dt_sub / dz * delta_w * t_polar * af_diff[i]
        d_rows.append(d_i)

    # last row
    term_diff_last = kappa_rows[n - 2] / (dz * dz) * dt_sub
    term_upwell_last = term_upwell_layer
    a_rows.append(-term_diff_last * af_top[n - 1])
    b_rows.append(1.0 + (term_diff_last + term_upwell_last) * af_top[n - 1])
    c_rows.append(jnp.zeros_like(b0))
    d_last = ocean[:, n - 1] + sc["pi_ratio"] * term_upwell_last * ocean0 * af_top[n - 1]
    d_last = d_last + dt_sub / dz * delta_w * (t_polar - init_prof[:, n - 1]) * af_top[n - 1]
    d_rows.append(d_last)

    # -- Thomas sweep, unrolled over layers, rows (2, T) --------------------
    c_prime = [c_rows[0] / b_rows[0]]
    d_prime = [d_rows[0] / b_rows[0]]
    for i in range(1, n):
        denom = b_rows[i] - a_rows[i] * c_prime[i - 1]
        c_prime.append(c_rows[i] / denom)
        d_prime.append((d_rows[i] - a_rows[i] * d_prime[i - 1]) / denom)
    x = [None] * n
    x[n - 1] = d_prime[n - 1]
    for i in range(n - 2, -1, -1):
        x[i] = d_prime[i] - c_prime[i] * x[i + 1]
    ocean = jnp.minimum(jnp.stack(x, axis=1), sc["max_temp"][None, None])

    # -- land / exchange / upwelling ----------------------------------------
    def sst_to_air(sst):
        alpha, gamma = sc["adj_alpha"], sc["adj_gamma"]
        nonzero = jnp.abs(gamma) > 1e-15
        gamma_safe = jnp.where(nonzero, gamma, jnp.ones_like(gamma))
        t_star = -(alpha - 1.0) / (2.0 * gamma_safe)
        delta_max = alpha * t_star + gamma * t_star * t_star - t_star
        quad = jnp.where(sst < t_star, alpha * sst + gamma * sst * sst, sst + delta_max)
        return jnp.where(nonzero, quad, alpha * sst)

    t_air_nho = sst_to_air(ocean[0, 0])
    t_air_sho = sst_to_air(ocean[1, 0])
    land = jnp.stack(
        [
            jnp.minimum(
                (erf * q1 * fgnl + sc["k_lo"] * sc["amplify"] * t_air_nho)
                / (sc["lam_l"] * fgnl + sc["k_lo"]),
                sc["max_temp"],
            ),
            jnp.minimum(
                (erf * q3 * fgsl + sc["k_lo"] * sc["amplify"] * t_air_sho)
                / (sc["lam_l"] * fgsl + sc["k_lo"]),
                sc["max_temp"],
            ),
        ]
    )

    exchange_nh = (
        sc["k_ns"] / fgno * (t_air_sho - t_air_nho) if fgno > 1e-15 else hemi[0]
    )
    exchange_sh = (
        sc["k_ns"] / fgso * (t_air_nho - t_air_sho) if fgso > 1e-15 else hemi[1]
    )
    hemi = jnp.stack([exchange_nh, exchange_sh])

    global_temp = (
        t_air_nho * fgno + land[0] * fgnl + t_air_sho * fgso + land[1] * fgsl
    )
    w_thresh = jnp.stack([scal[S], scal[S + 1]])  # appended rows (see pack)
    w_min = sc["w_initial"] * (1.0 - sc["w_var_frac"])
    ratios = jnp.minimum(global_temp[None] / w_thresh, 1.0)
    upwell = jnp.maximum(
        sc["w_initial"] * (1.0 - sc["w_var_frac"] * ratios), w_min[None]
    )
    return ocean, land, ground, hemi, upwell


def _build_kernel(st: UdebStatic):
    import jax
    import jax.numpy as jnp

    n, steps = st.n, st.steps

    def kernel(scal_ref, ocean_ref, init_ref, vec_ref, ocean_out, vec_out):
        # blocks are (rows, TILE_SUB, L): members fill whole (8, 128k)
        # granules, so per-(hemisphere, layer) row ops are VPU-dense
        scal = scal_ref[:]  # (S+2, 8, L)
        sub, lanes = scal.shape[-2], scal.shape[-1]
        ocean = ocean_ref[:].reshape(2, n, sub, lanes)
        init_prof = init_ref[:].reshape(2, n, sub, lanes)
        land = vec_ref[0:2]
        ground = vec_ref[2:4]
        hemi = vec_ref[4:6]
        upwell = vec_ref[6:8]
        alpha_eff = vec_ref[8:10]

        for m in range(1, steps + 1):
            ocean, land, ground, hemi, upwell = _month_body(
                st, jnp, jax, scal, ocean, land, ground, hemi, upwell,
                alpha_eff, init_prof, m / steps,
            )

        ocean_out[:] = ocean.reshape(2 * n, sub, lanes)
        vec_out[0:2] = land
        vec_out[2:4] = ground
        vec_out[4:6] = hemi
        vec_out[6:8] = upwell

    return kernel


def _months_jnp(st: UdebStatic, scal, ocean_flat, init_flat, vec):
    """Pure-jnp reference of the kernel on the same (rows, B) layout.

    Used as the differentiation path for the Pallas kernel (``custom_jvp``
    below): Pallas calls have no AD rules, but the month body is plain jnp,
    so tangents/cotangents flow through this equivalent computation.  On
    padded lanes (zero inputs) the arithmetic produces NaNs; lanes never
    mix, so they are confined and sliced away by the caller.
    """
    import jax
    import jax.numpy as jnp

    from jax import lax

    n, steps = st.n, st.steps
    b = ocean_flat.shape[-1]
    ocean = ocean_flat.reshape(2, n, b)
    init_prof = init_flat.reshape(2, n, b)
    land = vec[0:2]
    ground = vec[2:4]
    hemi = vec[4:6]
    upwell = vec[6:8]
    alpha_eff = vec[8:10]

    # scan (not an unrolled loop) over months: this path exists to be
    # DIFFERENTIATED — unrolling 12 months of ~1k ops each makes the
    # transposed graph explode at XLA compile time, while AD through a
    # scan stays linear in the body size
    def step(carry, frac):
        ocean, land, ground, hemi, upwell = carry
        return _month_body(
            st, jnp, jax, scal, ocean, land, ground, hemi, upwell,
            alpha_eff, init_prof, frac,
        ), None

    fracs = jnp.asarray(np.arange(1, steps + 1) / steps, dtype=ocean.dtype)
    (ocean, land, ground, hemi, upwell), _ = lax.scan(
        step, (ocean, land, ground, hemi, upwell), fracs
    )
    return (
        ocean.reshape(2 * n, b),
        jnp.concatenate([land, ground, hemi, upwell]),
    )


def _tile_geometry(b: int, interpret: bool):
    """(sublanes, lanes) of the member tile for a batch of ``b``.

    Interpret mode (CPU tests) and small batches use small tiles so the
    batch-of-1 primal doesn't pad to a full production tile; at ensemble
    scale the full (TILE_SUB, TILE_LANES) = (8, 256) tile (2048 members)
    amortizes per-op overhead and keeps every row op granule-dense.
    (8, 512) would exceed scoped VMEM — see the budget note at the top.
    """
    if interpret:
        return 1, 128
    if b < TILE_B:
        return TILE_SUB, 128
    return TILE_SUB, TILE_LANES


@functools.lru_cache(maxsize=32)
def _build_caller(
    st: UdebStatic, dtype_str: str, interpret: bool, tile_sub: int, tile_lanes: int
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_str)
    n = st.n
    kernel = _build_kernel(st)

    def call(scal, ocean_flat, init_flat, vec):
        # operands arrive as (rows, tile_sub, b8) with b8 % tile_lanes == 0
        b8 = ocean_flat.shape[-1]
        grid = (b8 // tile_lanes,)

        def tile_spec(rows):
            return pl.BlockSpec(
                (rows, tile_sub, tile_lanes),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )

        out_ocean, out_vec = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                tile_spec(S + 2),
                tile_spec(2 * n),
                tile_spec(2 * n),
                tile_spec(10),
            ],
            out_specs=[tile_spec(2 * n), tile_spec(8)],
            out_shape=[
                jax.ShapeDtypeStruct((2 * n, tile_sub, b8), dtype),
                jax.ShapeDtypeStruct((8, tile_sub, b8), dtype),
            ],
            interpret=interpret,
        )(scal, ocean_flat, init_flat, vec)
        return out_ocean, out_vec

    return call


def _static_from_component(comp) -> UdebStatic:
    """Build the compile-time bundle from a ClimateUDEB component."""
    n = int(comp.n_layers)
    dz = float(comp.layer_thickness)
    dz_mix = float(comp.mixed_layer_depth)
    dz1 = dz / 2.0
    idx = np.arange(1, n - 1)
    dz_up = np.where(idx == 1, dz1, dz)
    total_depth = dz_mix + (n - 1.0) * dz
    depths = dz_mix + np.arange(n - 1) * dz
    from rscm_tpu.magicc.climate.udeb import DIFFUSIVITY_CM2S_TO_M2YR

    return UdebStatic(
        n=n,
        steps=int(comp.steps_per_year),
        dt_sub=1.0 / int(comp.steps_per_year),
        dz=dz,
        dz_mix=dz_mix,
        c_mix=float(comp.mixed_layer_heat_capacity()),
        af_top=tuple(np.asarray(comp.af_top).tolist()),
        af_bot=tuple(np.asarray(comp.af_bottom).tolist()),
        af_diff=tuple(np.asarray(comp.af_diff).tolist()),
        relative_depth=tuple((depths / total_depth).tolist()),
        inv_dz_dzup=tuple((1.0 / (dz * dz_up)).tolist()),
        f_l=(float(comp.nh_land_fraction) / 2.0, float(comp.sh_land_fraction) / 2.0),
        fg=tuple(float(v) for v in comp.global_box_fractions()),
        qfrac=tuple(np.asarray(comp.co2_qfrac).tolist()),
        diffusivity_scale=DIFFUSIVITY_CM2S_TO_M2YR,
        land_heat_enabled=bool(comp.land_heat_capacity_enabled),
    )


@functools.lru_cache(maxsize=32)
def _get_member_fn(st: UdebStatic, interpret: bool):
    """Per-member year update: custom_jvp(custom_vmap(pallas)).

    Transform layering (both wrappers are built module-level from the
    hashable ``st`` so no trace-local value leaks into their rules):

    - ``custom_vmap``: under ``vmap`` the batched call routes to the
      lane-tiled Pallas kernel; unbatched calls run as a batch of one.
    - ``custom_jvp`` *outside* it: ``custom_vmap`` supports no AD
      transforms, and Pallas calls cannot be linearized, so derivatives
      (JVPs, and reverse mode via linearization of the JVP) flow through
      the pure-jnp reference implementation ``_months_jnp`` — identical
      arithmetic to the kernel, so tangents are exact and the primal
      under differentiation matches the kernel to f32 rounding.
    """
    import jax
    import jax.numpy as jnp
    from jax import custom_batching

    def batched_impl(scalars_b, ocean_b, init_b, vec_b):
        b = scalars_b.shape[0]
        dtype = jnp.result_type(ocean_b)
        tile_sub, tile_lanes = _tile_geometry(b, interpret)
        pad = (-b) % (tile_sub * tile_lanes)
        padded = b + pad
        caller = _build_caller(
            st, str(np.dtype(dtype)), interpret, tile_sub, tile_lanes
        )

        def prep(x, rows):
            # (b, rows) -> (rows, padded) -> (rows, tile_sub, padded/sub):
            # member m lands at (sub = m // (padded/sub), lane = m % ...);
            # padding lanes sit at the tail of the last sublane and are
            # sliced away after unprep (lanes never mix)
            x = jnp.asarray(x, dtype).reshape(b, rows).T  # (rows, b)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad)))
            return x.reshape(rows, tile_sub, padded // tile_sub)

        def unprep(x, rows):
            x = x.reshape(rows, padded)
            if pad:
                x = x[:, :b]
            return x.T

        n = st.n
        scal = prep(scalars_b, S + 2)
        ocean_flat = prep(ocean_b, 2 * n)
        init_flat = prep(init_b, 2 * n)
        vec = prep(vec_b, 10)
        out_ocean, out_vec = caller(scal, ocean_flat, init_flat, vec)
        return (
            unprep(out_ocean, 2 * n).reshape(b, 2, n),
            unprep(out_vec, 8),
        )

    @custom_batching.custom_vmap
    def core(scalars, ocean, init_prof, vec):
        o, v = batched_impl(
            scalars[None], ocean[None], init_prof[None], vec[None]
        )
        return o[0], v[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, scalars, ocean, init_prof, vec):
        def bcast(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = [
            bcast(a, bat)
            for a, bat in zip((scalars, ocean, init_prof, vec), in_batched)
        ]
        out = batched_impl(*args)
        return out, (True, True)

    def _ref_single(scalars, ocean, init_prof, vec):
        n = st.n
        o, v = _months_jnp(
            st,
            scalars[:, None],
            ocean.reshape(2 * n)[:, None],
            init_prof.reshape(2 * n)[:, None],
            vec[:, None],
        )
        return o[:, 0].reshape(2, n), v[:, 0]

    @jax.custom_jvp
    def year_fn(scalars, ocean, init_prof, vec):
        return core(scalars, ocean, init_prof, vec)

    @year_fn.defjvp
    def _year_jvp(primals, tangents):
        return jax.jvp(_ref_single, primals, tangents)

    return year_fn


def udeb_year_update(comp, dt_year, scalars, ocean, init_prof, vec):
    """One year of monthly UDEB sub-steps via the Pallas kernel.

    Per-member shapes (the traced component calls this under ``vmap``):
    ``scalars`` (S+2,), ``ocean``/``init_prof`` (2, n), ``vec`` (10,) —
    [land(2), ground(2), hemi(2), upwell(2), alpha_eff(2)].  Returns
    ``(new_ocean (2, n), new_vec (8,))`` — [land, ground, hemi, upwell].

    The batched form (under vmap) tiles members across lanes; the
    unbatched form runs as a batch of one; derivatives flow through the
    jnp reference implementation (see :func:`_get_member_fn`).
    """
    import jax

    st = _static_from_component(comp)
    if abs(dt_year * 1.0 / st.steps - st.dt_sub) > 1e-12:
        # non-unit annual step: fold into dt_sub statically
        st = UdebStatic(**{**st.__dict__, "dt_sub": float(dt_year) / st.steps})

    # target-aware: an explicit month_engine="pallas" on a CPU mesh runs
    # the kernel in interpret mode instead of consulting (and possibly
    # initializing) the default backend
    from rscm_tpu.utils.target import target_platform

    interpret = target_platform() != "tpu"
    return _get_member_fn(st, interpret)(scalars, ocean, init_prof, vec)
