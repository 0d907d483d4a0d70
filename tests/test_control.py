"""DQN IRS control plane (control/dqn_irs.py): the rebuild of the
reference's embedded stable-baselines3 DQN block (IRS_AP.grc:464-563)."""

import numpy as np
import pytest

from gnuradio_wifi_imagetransfer_tpu.control import (
    DqnAgent, DqnConfig, IrsControlClient, IrsControlServer, IrsPowerEnv,
    ReplayBuffer,
)


def test_replay_buffer_wraps():
    buf = ReplayBuffer(capacity=4, obs_dim=2)
    for i in range(6):
        buf.push(np.full(2, i, np.float32), i, float(i),
                 np.full(2, i + 1, np.float32), 0.0)
    assert buf.size == 4
    rng = np.random.default_rng(0)
    obs, action, reward, next_obs, done = buf.sample(rng, 8)
    assert obs.shape == (8, 2)
    assert set(action.tolist()) <= {2, 3, 4, 5}   # oldest two overwritten


def test_env_rewards_depend_on_action():
    env = IrsPowerEnv(n_grid=3, obs_dim=4, seed=0)
    env.reset()
    powers = [env.step(a)[1] for a in range(env.n_actions)]
    assert len(set(np.round(powers, 6))) > 1, "codebook must matter"
    best = env.best_action()
    assert powers[best] == max(powers)


def test_dqn_learns_power_bandit():
    env = IrsPowerEnv(n_grid=3, obs_dim=4, seed=1)
    cfg = DqnConfig(obs_dim=4, n_actions=env.n_actions, batch_size=32,
                    buffer_size=2000, eps_decay_steps=300, gamma=0.0,
                    learning_rate=3e-3, target_update=25)
    agent = DqnAgent(cfg, seed=1)
    obs = env.reset()
    for _ in range(600):
        a = agent.act(obs)
        next_obs, r = env.step(a)
        agent.observe(obs, a, r, next_obs, 0.0)
        obs = next_obs
    best = env.best_action()
    greedy = agent.act(obs, greedy=True)
    # the greedy policy's power must be near-optimal (within 1 dB)
    _, r_greedy = env.step(greedy)
    _, r_best = env.step(best)
    assert r_greedy >= r_best - 1.0, (r_greedy, r_best)


def test_tcp_action_push():
    srv = IrsControlServer()
    cli = IrsControlClient(port=srv.port)
    for a in (3, 1, 4):
        cli.send_action(a, meta={"power_db": -42.0})
    cli.close()
    import time
    for _ in range(50):
        if len(srv.actions) >= 3:
            break
        time.sleep(0.05)
    assert [m["action"] for m in srv.actions] == [3, 1, 4]
    assert srv.actions[0]["power_db"] == -42.0
    srv.stop()
