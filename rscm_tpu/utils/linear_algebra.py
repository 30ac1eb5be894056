"""
Small dense/banded linear-algebra kernels.

Mirror of ``crates/rscm-core/src/utils/linear_algebra.rs``:

- :func:`thomas_solve` — tridiagonal solve (used by the UDEB ocean column's
  implicit diffusion step).  Host path is straight float64; the traced path
  runs the same forward sweep / back substitution as a ``lax.scan`` pair —
  for the ~50-layer ocean columns this sequential solve is tiny and lives
  inside the fused step program.
- :func:`invert_4x4` — Gauss-Jordan with partial pivoting (used by the
  LAMCALC 4x4 coupling-matrix inversion).  The traced path uses
  ``jnp.linalg.inv`` (equivalent up to pivoting order on well-conditioned
  LAMCALC matrices).
"""

from __future__ import annotations

import numpy as np

__all__ = ["thomas_solve", "thomas_solve_batched", "thomas_solve_assoc", "invert_4x4"]


def _is_traced(*xs) -> bool:
    import jax

    return any(isinstance(x, (jax.Array, jax.core.Tracer)) for x in xs)


def thomas_solve(a, b, c, d):
    """Solve a tridiagonal system (sub-diag a, diag b, super-diag c, rhs d).

    ``a[0]`` and ``c[n-1]`` are ignored.  Returns x with ``len(b)`` entries.
    """
    if _is_traced(a, b, c, d):
        return _thomas_solve_traced(a, b, c, d)

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    n = len(b)
    assert len(a) == n and len(c) == n and len(d) == n
    assert n > 0, "System must have at least one equation"
    assert abs(b[0]) > 1e-15, "Zero pivot encountered at row 0"

    c_prime = np.zeros(n)
    d_prime = np.zeros(n)
    c_prime[0] = c[0] / b[0]
    d_prime[0] = d[0] / b[0]
    for i in range(1, n):
        denom = b[i] - a[i] * c_prime[i - 1]
        assert abs(denom) > 1e-15, f"Zero pivot encountered at row {i}"
        if i < n - 1:
            c_prime[i] = c[i] / denom
        d_prime[i] = (d[i] - a[i] * d_prime[i - 1]) / denom

    x = np.zeros(n)
    x[n - 1] = d_prime[n - 1]
    for i in range(n - 2, -1, -1):
        x[i] = d_prime[i] - c_prime[i] * x[i + 1]
    return x


def _thomas_solve_traced(a, b, c, d):
    import jax.lax as lax
    import jax.numpy as jnp

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    n = b.shape[0]

    # Forward sweep: carry (c'_{i-1}, d'_{i-1})
    def forward(carry, inputs):
        c_prev, d_prev = carry
        a_i, b_i, c_i, d_i = inputs
        denom = b_i - a_i * c_prev
        c_new = c_i / denom
        d_new = (d_i - a_i * d_prev) / denom
        return (c_new, d_new), (c_new, d_new)

    c0 = c[0] / b[0]
    d0 = d[0] / b[0]
    (_, _), (c_rest, d_rest) = lax.scan(
        forward, (c0, d0), (a[1:], b[1:], c[1:], d[1:])
    )
    c_prime = jnp.concatenate([jnp.asarray([c0]), c_rest])
    d_prime = jnp.concatenate([jnp.asarray([d0]), d_rest])

    # Back substitution: carry x_{i+1}
    def backward(x_next, inputs):
        c_i, d_i = inputs
        x_i = d_i - c_i * x_next
        return x_i, x_i

    x_last = d_prime[n - 1]
    _, x_rest = lax.scan(
        backward, x_last, (c_prime[: n - 1][::-1], d_prime[: n - 1][::-1])
    )
    return jnp.concatenate([x_rest[::-1], jnp.asarray([x_last])])


def thomas_solve_batched(a, b, c, d):
    """Tridiagonal solve along the trailing axis, batched over leading axes.

    Same recursion as :func:`thomas_solve` (sub-diag ``a``, diag ``b``,
    super-diag ``c``, rhs ``d``; ``a[..., 0]`` and ``c[..., -1]`` ignored),
    unrolled over the static layer count so every operation is elementwise
    over the leading batch axes.  This is the traced fast path for the UDEB
    ocean columns (reference recursion:
    ``crates/rscm-core/src/utils/linear_algebra.rs:41``): at ~50 layers the
    sweep compiles to a short chain of fused vector ops that stays fully
    vectorized over hemispheres x ensemble members, where
    ``lax.linalg.tridiagonal_solve`` both ran slower and faulted on TPU for
    batch sizes of ~10k and above.
    """
    import jax.numpy as jnp

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    m = b.shape[-1]

    c_prime = [c[..., 0] / b[..., 0]]
    d_prime = [d[..., 0] / b[..., 0]]
    for i in range(1, m):
        denom = b[..., i] - a[..., i] * c_prime[i - 1]
        c_prime.append(c[..., i] / denom)
        d_prime.append((d[..., i] - a[..., i] * d_prime[i - 1]) / denom)

    x = [None] * m
    x[m - 1] = d_prime[m - 1]
    for i in range(m - 2, -1, -1):
        x[i] = d_prime[i] - c_prime[i] * x[i + 1]
    return jnp.stack(x, axis=-1)


def invert_4x4_traced(m):
    """Closed-form 4x4 inverse (cofactor/adjugate expansion) on the traced path.

    Purely elementwise in the 16 entries, so it stays fully vectorized under
    vmap/scan — unlike ``jnp.linalg.inv``, whose batched LU kernel inside a
    ``fori_loop``-in-``scan`` program faulted on TPU at ensemble sizes of
    ~10k and above.  The LAMCALC coupling matrices this inverts are small and
    well-conditioned, where the cofactor expansion is numerically fine.
    """
    import jax.numpy as jnp

    m = jnp.asarray(m)
    a = [[m[..., i, j] for j in range(4)] for i in range(4)]

    def det3(rows, cols):
        (r0, r1, r2), (c0, c1, c2) = rows, cols
        return (
            a[r0][c0] * (a[r1][c1] * a[r2][c2] - a[r1][c2] * a[r2][c1])
            - a[r0][c1] * (a[r1][c0] * a[r2][c2] - a[r1][c2] * a[r2][c0])
            + a[r0][c2] * (a[r1][c0] * a[r2][c1] - a[r1][c1] * a[r2][c0])
        )

    others = [tuple(k for k in range(4) if k != i) for i in range(4)]
    cof = [
        [(-1.0) ** (i + j) * det3(others[i], others[j]) for j in range(4)]
        for i in range(4)
    ]
    det = sum(a[0][j] * cof[0][j] for j in range(4))
    inv_det = 1.0 / det
    # inverse = adjugate / det = transpose(cofactor matrix) / det
    rows = [
        jnp.stack([cof[j][i] * inv_det for j in range(4)], axis=-1) for i in range(4)
    ]
    return jnp.stack(rows, axis=-2)


def invert_4x4(m):
    """Invert a 4x4 matrix; host path mirrors the reference's Gauss-Jordan
    (returns None when singular), traced path uses the closed-form
    cofactor expansion (:func:`invert_4x4_traced`)."""
    if _is_traced(m):
        return invert_4x4_traced(m)

    m = np.asarray(m, dtype=np.float64)
    assert m.shape == (4, 4)
    aug = np.concatenate([m.copy(), np.eye(4)], axis=1)
    for col in range(4):
        max_row = col + int(np.argmax(np.abs(aug[col:, col])))
        if abs(aug[max_row, col]) < 1e-12:
            return None
        if max_row != col:
            aug[[col, max_row]] = aug[[max_row, col]]
        aug[col] /= aug[col, col]
        for row in range(4):
            if row != col:
                aug[row] -= aug[row, col] * aug[col]
    return aug[:, 4:].copy()


def thomas_solve_assoc(a, b, c, d):
    """Log-depth tridiagonal solve via ``lax.associative_scan``.

    Same system convention as :func:`thomas_solve_batched` (trailing axis
    is the layer axis, leading axes batch).  The sequential sweeps have
    serial depth ~3N; here each becomes an associative scan of depth
    ~log2(N):

    - the ``c'`` recurrence ``c'_i = c_i / (b_i - a_i c'_{i-1})`` is a
      Moebius transform of ``c'_{i-1}``, so prefixes compose as 2x2 matrix
      products (normalised by their max-|entry| each combine — a Moebius
      transform is scale-invariant, and the rescale keeps f32 products of
      ~50 matrices from over/underflowing);
    - given ``c'``, the ``d'`` forward recurrence and the back-substitution
      are affine recurrences ``y_i = u_i + v_i y_{i±1}``, composed as
      ``(u, v)`` pairs.

    Results agree with the sequential sweep to ~1e-12 relative (f64) on
    diagonally dominant systems.  Measured on the 50-layer UDEB columns
    (TPU v5e): the unrolled sequential sweep is FASTER (0.69 s vs 2.19 s
    for the 10k-member MAGICC ensemble) — XLA fuses the elementwise sweep
    into a handful of kernels, while the Moebius composition triples the
    arithmetic and the scan's gather structure defeats fusion.  Kept as a
    documented alternative for much deeper tridiagonal systems, where the
    O(log N) depth eventually wins.
    """
    import jax.numpy as jnp
    from jax import lax

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)

    # -- c' via Moebius composition -----------------------------------------
    # elementwise matrices M_i = [[0, c_i], [-a_i, b_i]] (a_0 forced to 0)
    a0 = a.at[..., 0].set(0.0) if hasattr(a, "at") else a
    zeros = jnp.zeros_like(b)
    m00, m01 = zeros, c
    m10, m11 = -a0, b

    def moebius_combine(p, q):
        # apply q after p: Q @ P, renormalised
        p00, p01, p10, p11 = p
        q00, q01, q10, q11 = q
        r00 = q00 * p00 + q01 * p10
        r01 = q00 * p01 + q01 * p11
        r10 = q10 * p00 + q11 * p10
        r11 = q10 * p01 + q11 * p11
        scale = jnp.maximum(
            jnp.maximum(jnp.abs(r00), jnp.abs(r01)),
            jnp.maximum(jnp.abs(r10), jnp.abs(r11)),
        )
        scale = jnp.where(scale > 0, scale, 1.0)
        return (r00 / scale, r01 / scale, r10 / scale, r11 / scale)

    p00, p01, p10, p11 = lax.associative_scan(
        moebius_combine, (m00, m01, m10, m11), axis=-1
    )
    # c'_i = Moebius(P_i)(c'_0 = 0) = P[0,1] / P[1,1]
    c_prime = p01 / p11

    # -- d' via affine composition ------------------------------------------
    c_prev = jnp.concatenate(
        [jnp.zeros_like(c_prime[..., :1]), c_prime[..., :-1]], axis=-1
    )
    w = b - a0 * c_prev  # the same denominators the sweep would use
    u = d / w
    v = -a0 / w  # v_0 = 0: d'_0 = d_0 / b_0 exactly

    def affine_combine(p, q):
        pu, pv = p
        qu, qv = q
        return (qu + qv * pu, qv * pv)

    d_prime, _ = lax.associative_scan(affine_combine, (u, v), axis=-1)

    # -- back substitution (affine, reversed) --------------------------------
    ub = d_prime[..., ::-1]
    vb = jnp.concatenate(
        [jnp.zeros_like(c_prime[..., :1]), -c_prime[..., ::-1][..., 1:]],
        axis=-1,
    )
    xb, _ = lax.associative_scan(affine_combine, (ub, vb), axis=-1)
    return xb[..., ::-1]
