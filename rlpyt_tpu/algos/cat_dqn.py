"""Categorical DQN / C51 (reference: rlpyt/algos/dqn/cat_dqn.py:
CategoricalDQN ~L10).

Subclasses DQN, replacing the scalar TD loss with the distributional
Bellman backup: project the shifted atom support r + γⁿ·z onto the fixed
support (ops/value.py:categorical_projection — fully vectorized, no
scatter) and take cross-entropy; KL serves as the PER priority.  Combined
with double_dqn + dueling model + prioritized_replay + n_step this is the
"Rainbow minus noisy nets" combo the reference ships as config "ernbw".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.ops.value import categorical_projection
from rlpyt_tpu.struct import valid_mean


class CategoricalDQN(DQN):
    def __init__(self, *args, v_min: float = -10.0, v_max: float = 10.0,
                 n_atoms: int = 51, **kwargs):
        super().__init__(*args, **kwargs)
        self.v_min = v_min
        self.v_max = v_max
        self.n_atoms = n_atoms

    def initialize(self, agent, batch_spec, example_obs, key, n_itr=1):
        # Keep the agent's atom support authoritative if it defines one.
        if hasattr(agent, "v_min"):
            self.v_min, self.v_max = agent.v_min, agent.v_max
            self.n_atoms = agent.n_atoms
        return super().initialize(agent, batch_spec, example_obs, key, n_itr)

    @property
    def z(self):
        return jnp.linspace(self.v_min, self.v_max, self.n_atoms)

    def loss(self, params, target_params, batch):
        """Distributional backup (rlpyt cat_dqn.py:loss ~L40).
        Returns (scalar loss, KL priorities)."""
        z = self.z
        agent = self.agent
        # p(s, ·, ·): [batch, A, n_atoms]
        ps = agent.model.apply(params, *batch.agent_inputs)
        p = jnp.take_along_axis(
            ps, batch.action[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]  # [batch, n_atoms]

        target_ps = agent.model.apply(target_params, *batch.target_inputs)
        if self.double_dqn:
            online_ps = agent.model.apply(params, *batch.target_inputs)
            next_q = jnp.sum(online_ps * z, axis=-1)
        else:
            next_q = jnp.sum(target_ps * z, axis=-1)
        next_a = jnp.argmax(next_q, axis=-1)
        target_p = jnp.take_along_axis(
            target_ps, next_a[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]

        nonterminal = 1.0 - batch.done_n.astype(jnp.float32)
        proj = categorical_projection(
            jax.lax.stop_gradient(target_p), batch.return_, nonterminal, z,
            discount_n=self.discount ** self.n_step)

        logp = jnp.log(jnp.maximum(p, 1e-8))
        ce = -jnp.sum(proj * logp, axis=-1)
        # KL(proj ‖ p) as priority (rlpyt uses the same cross-entropy-based
        # KL measure).
        kl = ce + jnp.sum(
            jnp.where(proj > 0, proj * jnp.log(jnp.maximum(proj, 1e-8)),
                      0.0), axis=-1)
        valid = 1.0 - batch.timeout_n.astype(jnp.float32)
        losses = ce * batch.is_weights * valid
        priorities = jnp.abs(kl) * valid
        return valid_mean(losses, valid), priorities
