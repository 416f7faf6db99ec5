"""Offline rollout collection → packed FrameStore (SURVEY.md §3.4).

The reference collects Atari frames from ALE/gym rollouts before training.
Here the collector prefers real ALE (``gymnasium``/``gym``) when installed,
and falls back to the scripted synthetic Pong simulator (same frame
statistics: ball + paddles, 64² grayscale [B:7]) so the Transporter pipeline
is runnable in any environment. Single-process, CPU, runs once before
training.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from keypoints_tpu.data.records import FrameStore, episode_pairs


def _ale_available(env_name: str) -> bool:
    """True only if ``gym.make(env_name)`` actually succeeds.

    A bare import check is not enough: gym can be installed without ale-py
    or the Atari ROMs, in which case ``make`` raises at collection time.
    """
    try:
        import gymnasium as gym
    except ImportError:
        try:
            import gym
        except ImportError:
            return False
    try:
        env = gym.make(env_name, render_mode="rgb_array")
        env.close()
        return True
    except Exception:
        return False


def collect_ale(env_name: str, episodes: int, max_steps: int, size: int,
                seed: int = 0) -> tuple[np.ndarray, list[int]]:
    """Random-policy ALE rollouts → (frames u8 (N,1,size,size), ep lengths)."""
    try:
        import gymnasium as gym
    except ImportError:
        import gym
    import cv2
    env = gym.make(env_name, render_mode="rgb_array")
    frames, lengths = [], []
    rng = np.random.RandomState(seed)
    for ep in range(episodes):
        env.reset(seed=seed + ep)
        n = 0
        for _ in range(max_steps):
            _, _, term, trunc, _ = env.step(env.action_space.sample())
            img = env.render()
            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
            gray = cv2.resize(gray, (size, size),
                              interpolation=cv2.INTER_AREA)
            frames.append(gray[None])
            n += 1
            if term or trunc:
                break
        lengths.append(n)
    env.close()
    return np.stack(frames).astype(np.uint8), lengths


def collect_scripted_pong(episodes: int, steps_per_episode: int, size: int,
                          seed: int = 0) -> tuple[np.ndarray, list[int]]:
    """Scripted Pong physics rollouts (no gym needed), u8 frames.

    Trajectories are simulated on the host (cheap scalar physics) and the
    whole episode is rendered in ONE jitted device call — per-frame dispatch
    through a remote device would be thousands of round-trips.
    """
    import jax
    import jax.numpy as jnp
    from keypoints_tpu.data.synthetic import _render_pong, reflect_unit

    render = jax.jit(lambda balls, pads: _render_pong(balls, pads, size))
    rng = np.random.RandomState(seed)
    frames, lengths = [], []
    dt = 0.08
    for ep in range(episodes):
        # Integrate the UNFOLDED position and fold only for rendering: the
        # fold is then a true triangle wave of t, i.e. the ball bounces off
        # the walls instead of jittering at them (or, with the old
        # |mod(x+1,4)-2|-1 formula, mirror-teleporting every step).
        ball = rng.uniform(-0.7, 0.7, 2)
        vel = rng.uniform(0.5, 1.5, 2) * np.sign(rng.uniform(-1, 1, 2))
        balls = np.empty((steps_per_episode, 2), np.float32)
        pads = np.empty((steps_per_episode, 2), np.float32)
        for t in range(steps_per_episode):
            pos = reflect_unit(ball)
            balls[t] = pos
            pads[t] = np.clip(pos[1] + 0.1 * rng.randn(2), -0.8, 0.8)
            ball = ball + vel * dt
        ep_frames = np.asarray(render(jnp.asarray(balls), jnp.asarray(pads)))
        frames.append(ep_frames)
        lengths.append(steps_per_episode)
    arr = (np.clip(np.concatenate(frames), 0, 1) * 255).astype(np.uint8)
    return arr, lengths


def collect(out_path: str, env_name: Optional[str] = "ALE/Pong-v5",
            episodes: int = 20, steps_per_episode: int = 200,
            size: int = 64, delta: int = 2, seed: int = 0) -> str:
    """Collect rollouts and write a FrameStore with a temporal-pair index."""
    if env_name and _ale_available(env_name):
        frames, lengths = collect_ale(env_name, episodes, steps_per_episode,
                                      size, seed)
        # real ALE frames: scripted-Pong ground truth does NOT apply
        meta = {"origin": "ale", "env": env_name, "seed": seed}
    else:
        frames, lengths = collect_scripted_pong(episodes, steps_per_episode,
                                                size, seed)
        meta = {"origin": "scripted_pong", "seed": seed}
    pairs = episode_pairs(lengths, delta)
    FrameStore.write(out_path, frames, pairs, meta=meta)
    return out_path


def _cli(argv=None):
    """Standalone collection entry point (the reference's pre-training
    collect-script workflow, SURVEY.md §3.4); the trainer also auto-collects
    on first run when the store is absent."""
    import argparse

    from keypoints_tpu.utils.compile_cache import enable_compile_cache

    from keypoints_tpu.utils.platform import apply_platform
    apply_platform()      # $KEYPOINTS_TPU_PLATFORM (axon ignores
    enable_compile_cache()  # JAX_PLATFORMS); before device access
    p = argparse.ArgumentParser(
        description="Build a packed FrameStore with a temporal-pair index: "
                    "from Atari rollouts (or the scripted-Pong fallback), "
                    "or from video footage with --video")
    p.add_argument("--out", required=True, help="output store path")
    p.add_argument("--env", default="ALE/Pong-v5",
                   help="gym env id; 'none' forces the scripted fallback")
    p.add_argument("--video", default=None, metavar="PATH",
                   help="ingest a video file or folder of videos instead of "
                        "collecting rollouts (each file = one episode)")
    p.add_argument("--stride", type=int, default=1,
                   help="with --video: keep every stride-th source frame")
    p.add_argument("--channels", type=int, default=3, choices=(1, 3),
                   help="with --video: stored channels (1 = grayscale)")
    p.add_argument("--max-frames", type=int, default=None,
                   help="with --video: cap stored frames per video file")
    p.add_argument("--episodes", type=int, default=20)
    p.add_argument("--steps-per-episode", type=int, default=200)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--delta", type=int, default=2,
                   help="temporal pair offset (frame_t, frame_{t+delta})")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.video is not None:
        from keypoints_tpu.data.records import video_to_store
        path = video_to_store(args.video, args.out, args.size, args.channels,
                              args.stride, args.delta, args.max_frames)
        store = FrameStore(path)
        n_pairs = 0 if store.pairs is None else len(store.pairs)
        print(f"wrote {path}: {store.frames.shape[0]} frames "
              f"{store.frames.shape[1:]}, {n_pairs} pairs")
        return

    env = None if args.env.lower() == "none" else args.env
    using_ale = env is not None and _ale_available(env)
    print(f"collecting {args.episodes} episodes via "
          f"{'ALE ' + env if using_ale else 'scripted Pong (no ALE)'}",
          flush=True)
    path = collect(args.out, env, args.episodes, args.steps_per_episode,
                   args.size, args.delta, args.seed)
    store = FrameStore(path)
    print(f"wrote {path}: {store.frames.shape[0]} frames "
          f"{store.frames.shape[1:]}, {len(store.pairs)} pairs")


if __name__ == "__main__":
    _cli()
