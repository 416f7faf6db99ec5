"""Synthetic datasets, generated entirely on device inside jit.

Two families (SURVEY.md §4.3, §7 PR1/PR3):

* ``moving_dots`` — D colored Gaussian dots at random positions; the (source,
  target) pair shows the *same* dots displaced. The behavioral integration
  test: keypoints must lock onto the dots within ~50 train steps.
* ``scripted_pong`` — a Pong-shaped frame (ball + two paddles, 64² grayscale)
  with physics scripted from the random state; temporal pairs (t, t+Δ) feed
  the Transporter exactly like stored ALE rollouts would [B:7][B:9].

Because frames are pure functions of a PRNG key, the "dataset" is an infinite
stream keyed by step — zero host I/O, zero H2D traffic beyond the key. Real
datasets (CelebA/Atari files) live in ``data/records.py``; these synthetic
sets are their drop-in stand-ins and the test fixtures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoints_tpu.ops.gaussian import gaussian_maps


def render_dots(positions: jnp.ndarray, size: int, channels: int = 3,
                sigma: float = 0.06) -> jnp.ndarray:
    """Render (B, D, 2) normalized dot positions to NCHW images in [0, 1].

    Dot d gets color channel d % channels so dots are distinguishable.
    """
    b, d, _ = positions.shape
    maps = gaussian_maps(positions, size, size, sigma)        # (B, D, H, W)
    chan = jnp.arange(d) % channels                           # (D,)
    onehot = jax.nn.one_hot(chan, channels, dtype=maps.dtype) # (D, C)
    img = jnp.einsum("bdhw,dc->bchw", maps, onehot)
    return jnp.clip(img, 0.0, 1.0)


def moving_dots_pair(key: jax.Array, batch: int, size: int = 64,
                     num_dots: int = 4, channels: int = 3,
                     max_shift: float = 0.2, sigma: float = 0.06):
    """→ (x_source, x_target, true_positions_target) NCHW in [0, 1]."""
    k_pos, k_shift = jax.random.split(key)
    pos = jax.random.uniform(k_pos, (batch, num_dots, 2), minval=-0.7,
                             maxval=0.7)
    shift = jax.random.uniform(k_shift, (batch, num_dots, 2),
                               minval=-max_shift, maxval=max_shift)
    tgt_pos = jnp.clip(pos + shift, -0.85, 0.85)
    return (render_dots(pos, size, channels, sigma),
            render_dots(tgt_pos, size, channels, sigma),
            tgt_pos)


# --- scripted Pong ----------------------------------------------------------


def reflect_unit(x):
    """Fold any real x into [-1, 1] by wall reflection (triangle wave).

    Identity on [-1, 1]; 1.1 → 0.9, -1.3 → -0.7, 2.5 → -0.5. Works for jnp
    and np arrays alike (pure ufunc arithmetic).
    """
    return 1.0 - abs((x + 1.0) % 4.0 - 2.0)


_PADDLE_X = 0.9          # |x| of the two paddles
_PADDLE_HALF_H = 0.15    # half-height in normalized units
_PADDLE_HALF_W = 0.02
_BALL_SIGMA = 0.04


def _render_pong(ball: jnp.ndarray, paddles_y: jnp.ndarray,
                 size: int) -> jnp.ndarray:
    """ball (B, 2), paddles_y (B, 2) → (B, 1, size, size) grayscale frames."""
    b = ball.shape[0]
    ball_img = gaussian_maps(ball[:, None, :], size, size,
                             _BALL_SIGMA)[:, 0]               # (B, H, W)
    c = jnp.linspace(-1.0, 1.0, size)
    gx = c[None, None, :]                                     # (1, 1, W)
    gy = c[None, :, None]                                     # (1, H, 1)

    def paddle(px, py):
        inx = jnp.abs(gx - px) < _PADDLE_HALF_W + 2.0 / size
        iny = jnp.abs(gy - py[:, None, None]) < _PADDLE_HALF_H
        return (inx & iny).astype(jnp.float32)

    left = paddle(-_PADDLE_X, paddles_y[:, 0])
    right = paddle(_PADDLE_X, paddles_y[:, 1])
    frame = jnp.clip(ball_img + left + right, 0.0, 1.0)
    return frame[:, None]                                     # (B, 1, H, W)


def scripted_pong_pair(key: jax.Array, batch: int, size: int = 64,
                       dt: float = 0.15):
    """→ (frame_t, frame_{t+Δ}, state_target) temporal Pong pairs.

    Physics: ball moves with a random velocity and reflects off the [-1,1]
    walls; paddles track the ball's y with noise. ``state_target`` is the
    (ball, paddle_l, paddle_r) positions at t+Δ, shape (B, 3, 2) — usable as
    ground truth for keypoint-locking tests.
    """
    k_pos, k_speed, k_sign, k_pad = jax.random.split(key, 4)
    ball = jax.random.uniform(k_pos, (batch, 2), minval=-0.7, maxval=0.7)
    speed = jax.random.uniform(k_speed, (batch, 2), minval=0.5, maxval=1.5)
    sign = jnp.sign(jax.random.uniform(k_sign, (batch, 2)) - 0.5)
    vel = speed * sign

    # reflect off walls: triangle-wave fold into [-1, 1]; identity in-range
    # (1 - |mod(x+1,4)-2|; the earlier |mod(x+1,4)-2|-1 form NEGATES
    # in-range x — every temporal pair had a mirror-teleporting ball).
    ball2 = reflect_unit(ball + vel * dt)

    noise = 0.1 * jax.random.normal(k_pad, (batch, 2, 2))
    pad_y = jnp.clip(ball[:, 1:2, None] * jnp.ones((1, 2, 1)) + noise,
                     -0.8, 0.8)[..., 0]                       # (B, 2) at t
    pad_y2 = jnp.clip(ball2[:, 1:2] + 0.05 * noise[..., 1], -0.8, 0.8)

    f1 = _render_pong(ball, pad_y, size)
    f2 = _render_pong(ball2, pad_y2, size)
    state = jnp.stack([ball2,
                       jnp.stack([jnp.full((batch,), -_PADDLE_X),
                                  pad_y2[:, 0]], -1),
                       jnp.stack([jnp.full((batch,), _PADDLE_X),
                                  pad_y2[:, 1]], -1)], axis=1)
    return f1, f2, state
