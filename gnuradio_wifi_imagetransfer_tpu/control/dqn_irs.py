"""DQN-driven IRS phase-shift control, TPU-native.

The reference carries a (disabled) embedded GNU Radio block that runs a
stable-baselines3 DQN over the received-power observation and pushes the
chosen IRS phase-shift action to an IRS controller over TCP
192.168.10.5:56666 (IRS_AP.grc:464-563, state `disabled`). This module is
the framework's first-class rebuild of that control plane:

  * QNetwork / DqnAgent — a flax MLP Q-function with target network,
    epsilon-greedy exploration, and a jit-compiled double-DQN update (no
    stable-baselines3 / torch);
  * ReplayBuffer — flat numpy circular transition store;
  * IrsPowerEnv — a received-power environment over the clustered IRS
    geometry channel (channel/irs.py): actions select a phase-gradient
    codebook entry (gen_phase_nograd over a (theta, phi) grid), the reward
    is the resulting receive power in dB, observations are the recent
    power history (matching the reference agent's observation of the
    moving-average receive power);
  * IrsControlClient / IrsControlServer — the TCP action push, with a
    local server for loopback tests standing in for the IRS hardware
    controller.
"""

from __future__ import annotations

import dataclasses
import json
import socket
import socketserver
import threading

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class QNetwork(nn.Module):
    """MLP Q-function: observation -> per-action value."""

    n_actions: int
    hidden: tuple[int, ...] = (64, 64)

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.n_actions)(x)


class ReplayBuffer:
    """Circular (obs, action, reward, next_obs, done) store."""

    def __init__(self, capacity: int, obs_dim: int):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), np.float32)
        self.action = np.zeros(capacity, np.int32)
        self.reward = np.zeros(capacity, np.float32)
        self.next_obs = np.zeros((capacity, obs_dim), np.float32)
        self.done = np.zeros(capacity, np.float32)
        self.idx = 0
        self.size = 0

    def push(self, obs, action, reward, next_obs, done):
        i = self.idx
        self.obs[i] = obs
        self.action[i] = action
        self.reward[i] = reward
        self.next_obs[i] = next_obs
        self.done[i] = done
        self.idx = (i + 1) % self.capacity
        self.size = min(self.size + 1, self.capacity)

    def sample(self, rng: np.random.Generator, batch: int):
        j = rng.integers(0, self.size, batch)
        return (self.obs[j], self.action[j], self.reward[j],
                self.next_obs[j], self.done[j])


@dataclasses.dataclass
class DqnConfig:
    obs_dim: int = 8
    n_actions: int = 16
    gamma: float = 0.9
    learning_rate: float = 1e-3
    batch_size: int = 64
    buffer_size: int = 10_000
    target_update: int = 50      # steps between target-network syncs
    eps_start: float = 1.0
    eps_end: float = 0.05
    eps_decay_steps: int = 500


class DqnAgent:
    """Double-DQN agent with a jitted update step."""

    def __init__(self, cfg: DqnConfig = DqnConfig(), seed: int = 0):
        self.cfg = cfg
        self.net = QNetwork(cfg.n_actions)
        key = jax.random.PRNGKey(seed)
        obs0 = jnp.zeros((1, cfg.obs_dim), jnp.float32)
        self.params = self.net.init(key, obs0)
        self.target_params = self.params
        self.opt = optax.adam(cfg.learning_rate)
        self.opt_state = self.opt.init(self.params)
        self.buffer = ReplayBuffer(cfg.buffer_size, cfg.obs_dim)
        self.rng = np.random.default_rng(seed)
        self.steps = 0
        self._q = jax.jit(self.net.apply)
        self._update = jax.jit(self._update_impl)

    # -- acting ----------------------------------------------------------

    def epsilon(self) -> float:
        c = self.cfg
        frac = min(self.steps / max(c.eps_decay_steps, 1), 1.0)
        return c.eps_start + (c.eps_end - c.eps_start) * frac

    def act(self, obs: np.ndarray, greedy: bool = False) -> int:
        if not greedy and self.rng.random() < self.epsilon():
            return int(self.rng.integers(self.cfg.n_actions))
        q = self._q(self.params, jnp.asarray(obs, jnp.float32)[None])
        return int(jnp.argmax(q[0]))

    # -- learning --------------------------------------------------------

    def _update_impl(self, params, target_params, opt_state,
                     obs, action, reward, next_obs, done):
        # double DQN: online net picks argmax, target net evaluates
        next_q_online = self.net.apply(params, next_obs)
        next_a = jnp.argmax(next_q_online, axis=-1)
        next_q = self.net.apply(target_params, next_obs)
        next_v = jnp.take_along_axis(next_q, next_a[:, None], 1)[:, 0]
        target = reward + self.cfg.gamma * (1.0 - done) * next_v

        def loss_fn(p):
            q = self.net.apply(p, obs)
            qa = jnp.take_along_axis(q, action[:, None], 1)[:, 0]
            return jnp.mean((qa - jax.lax.stop_gradient(target)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def observe(self, obs, action, reward, next_obs, done) -> float | None:
        """Record a transition and (when warm) run one gradient step."""
        self.buffer.push(obs, action, reward, next_obs, done)
        self.steps += 1
        if self.buffer.size < self.cfg.batch_size:
            return None
        batch = self.buffer.sample(self.rng, self.cfg.batch_size)
        self.params, self.opt_state, loss = self._update(
            self.params, self.target_params, self.opt_state,
            *(jnp.asarray(b) for b in batch))
        if self.steps % self.cfg.target_update == 0:
            self.target_params = self.params
        return float(loss)


class IrsPowerEnv:
    """Received-power environment over the clustered IRS channel.

    Actions index a (theta, phi) phase-gradient codebook
    (ClusteredIRSChannel.gen_phase_nograd, mirroring
    utils/channel.py:248-268 in the reference); reward = receive power in
    dB for a fixed user under the sampled Rician channel; observation =
    the last obs_dim rewards (the agent watches the power history, like
    the reference block's moving-average receive-power input).
    """

    def __init__(self, n_grid: int = 4, obs_dim: int = 8, seed: int = 0,
                 k_factor: float = 10.0):
        from gnuradio_wifi_imagetransfer_tpu.channel.irs import (
            ClusteredIRSChannel,
        )

        self.ch = ClusteredIRSChannel(
            irs_unit_gap=0.03, irs_scale=8, cluster_scale=2,
            irs_pos=(0.015, 0.015, 0.0), ap_pos=(0.12, 0.12, 4.5),
            user_num=1, ap_num=1)
        self.obs_dim = obs_dim
        thetas = np.linspace(0, np.pi / 2, n_grid, endpoint=False)
        phis = np.linspace(0, np.pi, n_grid, endpoint=False)
        self.codebook = [
            np.asarray(self.ch.gen_phase_nograd(float(t), float(p)))
            for t in thetas for p in phis
        ]
        self.n_actions = len(self.codebook)
        pos_users = np.array([[30.0, 10.0, 1.5]])
        self.los = self.ch.gen_los(pos_users)
        self.k_factor = k_factor
        self.history = np.zeros(obs_dim, np.float32)

    def _power_db(self, psi: np.ndarray) -> float:
        h = np.asarray(self.ch.gen_chnl_ideal(self.los, jnp.asarray(psi)))
        p = float(np.sum(np.abs(h) ** 2))
        return 10.0 * np.log10(max(p, 1e-30))

    def reset(self) -> np.ndarray:
        self.history[:] = 0.0
        return self.history.copy()

    def step(self, action: int) -> tuple[np.ndarray, float]:
        reward = self._power_db(self.codebook[action])
        self.history = np.roll(self.history, 1)
        self.history[0] = reward
        return self.history.copy(), reward

    def best_action(self) -> int:
        return int(np.argmax([self._power_db(c) for c in self.codebook]))


# ---------------------------------------------------------------------------
# TCP action push (the reference pushes DQN actions to the IRS controller
# over TCP; IRS_AP.grc embedded block, target 192.168.10.5:56666)
# ---------------------------------------------------------------------------


class IrsControlClient:
    """Pushes chosen IRS actions to the controller as JSON lines."""

    def __init__(self, host: str = "127.0.0.1", port: int = 56666,
                 timeout: float = 2.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._f = self.sock.makefile("rwb")

    def send_action(self, action: int, meta: dict | None = None):
        msg = {"action": int(action)}
        if meta:
            msg.update(meta)
        self._f.write(json.dumps(msg).encode() + b"\n")
        self._f.flush()

    def close(self):
        try:
            self._f.close()
        finally:
            self.sock.close()


class IrsControlServer:
    """Loopback stand-in for the IRS hardware controller: collects pushed
    actions on a TCP port (test double for 192.168.10.5:56666)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.actions: list[dict] = []
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for line in self.rfile:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        outer.actions.append(json.loads(line))
                    except json.JSONDecodeError:
                        continue

        self._srv = socketserver.ThreadingTCPServer((host, port), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()
