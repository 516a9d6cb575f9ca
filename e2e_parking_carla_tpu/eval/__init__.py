"""Closed-loop evaluation: the policy driving the on-device simulator."""

from e2e_parking_carla_tpu.eval.agent import AgentState, apply_speed_limit  # noqa: F401
from e2e_parking_carla_tpu.eval.evaluator import ClosedLoopEvaluator  # noqa: F401
