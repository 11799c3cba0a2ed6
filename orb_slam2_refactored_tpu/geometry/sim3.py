"""Sim(3) similarity transforms as quaternion + translation + scale arrays.

Capability analog of the reference's `Sim3` (`/root/reference/include/Sim3.h:30-79`,
`Map(x) = s*R*x + t`) and of g2o's `Sim3` type used by the essential-graph
optimizer (`Thirdparty/g2o/g2o/types/sim3.h`). Layout: float32[..., 8] =
`[qw,qx,qy,qz,tx,ty,tz,log_s]`. Scale is stored in log space so the 7-DoF
pose-graph tangent is simply `[omega, upsilon, dlog_s]`.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3

DIM = 8
TANGENT_DIM = 7


def identity(batch_shape=()) -> jnp.ndarray:
    p = jnp.zeros(batch_shape + (DIM,), jnp.float32)
    return p.at[..., 0].set(1.0)


def make(q, t, s):
    """s is linear scale [...] (not log)."""
    return jnp.concatenate([q, t, jnp.log(s)[..., None]], axis=-1)


def rotation(g):
    return g[..., 0:4]


def translation(g):
    return g[..., 4:7]


def scale(g):
    return jnp.exp(g[..., 7])


def log_scale(g):
    return g[..., 7]


def from_se3(p, s=None):
    ls = jnp.zeros(p.shape[:-1] + (1,), p.dtype) if s is None else jnp.log(s)[..., None]
    return jnp.concatenate([p, ls], axis=-1)


def to_se3(g):
    """Drop scale: divide translation by s so projection of scaled maps matches
    the reference's `Correct` rescaling (`/root/reference/src/LoopClosing.cc:595-600`)."""
    s = scale(g)[..., None]
    return se3.make(rotation(g), translation(g) / s)


def transform(g, x):
    s = scale(g)
    if x.ndim > g.ndim:
        s = s[..., None]
        q = rotation(g)[..., None, :]
        t = translation(g)[..., None, :]
    else:
        q = rotation(g)
        t = translation(g)
    return s[..., None] * se3.quat_rotate(q, x) + t


def compose(a, b):
    """a @ b: x -> sa*Ra*(sb*Rb*x + tb) + ta."""
    q = se3.quat_mul(rotation(a), rotation(b))
    sa = scale(a)
    t = sa[..., None] * se3.quat_rotate(rotation(a), translation(b)) + translation(a)
    ls = log_scale(a) + log_scale(b)
    return jnp.concatenate([se3.quat_normalize(q), t, ls[..., None]], axis=-1)


def inverse(g):
    qi = se3.quat_conj(rotation(g))
    si = 1.0 / scale(g)
    t = -si[..., None] * se3.quat_rotate(qi, translation(g))
    return jnp.concatenate([qi, t, -log_scale(g)[..., None]], axis=-1)


def exp(tangent):
    """Sim(3) exp map, first-order-coupled like g2o's (rotation/scale exact,
    translation via the SE3 left Jacobian — adequate for LM retraction)."""
    omega = tangent[..., 0:3]
    ups = tangent[..., 3:6]
    dls = tangent[..., 6]
    p = se3.exp(jnp.concatenate([omega, ups], axis=-1))
    return jnp.concatenate([p, dls[..., None]], axis=-1)


def retract(g, delta):
    return compose(exp(delta), g)


def log(g):
    p = se3.log(g[..., 0:7])
    return jnp.concatenate([p, log_scale(g)[..., None]], axis=-1)
