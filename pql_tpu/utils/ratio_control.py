"""Host-side adaptive update-ratio controller for PQL.

The reference's feedback rate controller (reference
scripts/train_pql.py:127-158) exists to HOLD the realized critic:sim and
critic:actor update ratios at their configured targets despite the three
async processes running at unpredictable hardware speeds. In the fused
TPU design the realized ratios are exact static integers compiled into
the step, so that original control problem is solved by construction.

What remains worth adapting is the TARGET itself: when evaluation return
stalls, spending more learner FLOPs per simulated transition (a higher
critic:sim ratio) is the PQL-native lever — the reference tunes the same
knob by hand per task (pql_algo.yaml:17-18, BASELINE config 4's ratio
sweep). This controller watches the eval-return trace and escalates
``critic_sample_ratio`` multiplicatively when a stall is detected; the
trainer applies it through ``PQL.set_ratios`` (a cheap re-jit under the
persistent compilation cache — params/optimizer/replay carry over, see
pql_tpu/algos/pql.py).

Deliberately host-side and eval-driven: ratio changes recompile the
train step, so they must be rare, coarse events — not per-iteration
feedback. Pure logic, no jax dependency (unit-tested in
tests/test_utils.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RatioController:
    """Escalate critic_sample_ratio when the eval-return trace stalls.

    A stall = over the last ``window`` evals, the best return improved by
    less than ``min_improvement`` (relative to the spread seen so far,
    with an absolute floor to survive flat zero-reward starts).
    """

    critic_sample_ratio: int
    critic_actor_ratio: int
    window: int = 6
    factor: int = 2
    max_ratio: int = 32
    min_improvement: float = 0.05  # fraction of the all-time return spread

    _returns: list = field(default_factory=list)
    _lo: float = float("inf")
    _hi: float = float("-inf")

    def update(self, eval_return: float) -> tuple[int, int] | None:
        """Feed one eval return; returns new (critic_sample_ratio,
        critic_actor_ratio) when an escalation should be applied, else
        None. The caller is expected to pass the result to
        ``PQL.set_ratios`` and keep training."""
        self._lo = min(self._lo, eval_return)
        self._hi = max(self._hi, eval_return)
        self._returns.append(eval_return)
        if len(self._returns) < self.window:
            return None
        recent = self._returns[-self.window :]
        older_best = max(self._returns[: -self.window], default=recent[0])
        spread = max(self._hi - self._lo, 1e-6)
        improved = (max(recent) - older_best) / spread
        if improved >= self.min_improvement:
            return None
        if self.critic_sample_ratio * self.factor > self.max_ratio:
            return None  # at the cap — nothing left to escalate
        self.critic_sample_ratio *= self.factor
        # restart the stall window at the new operating point
        self._returns.clear()
        return (self.critic_sample_ratio, self.critic_actor_ratio)
