"""Amplitude transforms.

Reference: ricker_util.arctan_trans (ricker_util.py:270-275) and the batched
loc_cmt_util.arctan_trans (loc_cmt_util.py:576-587). The reference's nested
(receiver, component) Python loops become a single broadcast; batching over
traces is plain ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp


def arctan_transform(u, u0, u1, deriv: bool = False):
    """Squash amplitudes into (0, 1) with an arctan map.

    un = 0.5 + arctan(((u-u0) + (u-u1)) / (u1-u0)) / pi

    ``u0``/``u1`` broadcast against ``u``, so per-trace windows batch
    naturally (pass shapes (nr, nc, 1) against (nr, nc, nt)).
    With ``deriv=True`` also returns d(un)/du (the reference's ``dundu``) —
    though under autodiff the plain forward suffices.
    """
    up = ((u - u0) + (u - u1)) / (u1 - u0)
    un = 0.5 + jnp.arctan(up) / jnp.pi
    if deriv:
        und = 2.0 / ((u1 - u0) * jnp.pi * (1.0 + up * up))
        return un, und
    return un
