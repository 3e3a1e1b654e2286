"""Real spherical-harmonics direction encoding.

Equivalent of the reference SH kernel (SHShader.cu:10-106), which hardcodes
the SH polynomial basis (Sloan, "Stupid SH Tricks" A1). The reference
supports degree <= 8 but every shipped config uses degree 4 (16 dims,
confs/shader/sh_shader.yaml); degrees 1-4 use the hardcoded table below and
5-8 the recurrence path (sh_encode_general). Pure jnp polynomial
evaluation — XLA fuses it into the surrounding shader MLP.
"""

from __future__ import annotations

import jax.numpy as jnp


import math


def sh_encode_general(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real SH basis for any degree (the reference kernel hardcodes <= 8).

    Condon-Shortley convention matching the hardcoded table below; built
    from singularity-free Cartesian recurrences:
      A_m = s^m cos(m phi), B_m = s^m sin(m phi) (polynomials in x, y);
      P_l^m / s^m via the associated-Legendre recurrence in z.
    Order: index l^2 + (l + m), m in [-l, l].
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [None] * (degree * degree)

    # azimuthal polynomials A_m, B_m
    A = [one]
    B = [jnp.zeros_like(x)]
    for m in range(1, degree):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])

    def K(l, m):
        return math.sqrt((2 * l + 1) / (4 * math.pi)
                         * math.factorial(l - m) / math.factorial(l + m))

    def emit(l, m, p):
        k = K(l, m)
        if m == 0:
            out[l * l + l] = k * p
        else:
            sq2k = math.sqrt(2.0) * k
            out[l * l + l + m] = sq2k * p * A[m]
            out[l * l + l - m] = sq2k * p * B[m]

    for m in range(degree):
        # sectoral p~_mm = P_m^m / s^m (Condon-Shortley)
        coef = 1.0
        for i in range(1, m + 1):
            coef *= -(2 * i - 1)
        pmm = coef * one
        emit(m, m, pmm)
        if m + 1 < degree:
            pm1 = (2 * m + 1) * z * pmm
            emit(m + 1, m, pm1)
            p_lm2, p_lm1 = pmm, pm1
            for l in range(m + 2, degree):
                p = ((2 * l - 1) * z * p_lm1 - (l + m - 1) * p_lm2) / (l - m)
                emit(l, m, p)
                p_lm2, p_lm1 = p_lm1, p
    return jnp.stack(out, axis=-1)


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """dirs: [..., 3] unit direction vectors -> [..., degree**2] SH basis."""
    if not 1 <= degree <= 8:
        raise NotImplementedError(f"SH degree {degree} not supported (1..8)")
    if degree > 4:
        return sh_encode_general(dirs, degree)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)
