"""Episode metrics and failure-cause taxonomy.

Parity targets: habitat's SPL/success/soft-SPL measures as consumed by the
reference harness (vlfm_trainer.py:252-268) and the failure decision tree of
episode_stats_logger.py:44-72.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict
from typing import Optional


@dataclass
class EpisodeResult:
    success: bool
    spl: float
    soft_spl: float
    distance_to_goal: float
    steps: int
    path_length: float
    called_stop: bool
    target_detected: bool
    target_seen: bool
    collisions: int = 0
    failure_cause: Optional[str] = None

    def to_dict(self):
        return asdict(self)


def compute_result(
    *,
    called_stop: bool,
    distance_to_goal: float,
    success_radius: float,
    shortest_path: float,
    path_length: float,
    steps: int,
    max_steps: int,
    target_detected: bool,
    target_seen: bool,
    collisions: int = 0,
) -> EpisodeResult:
    success = called_stop and distance_to_goal <= success_radius
    denom = max(path_length, shortest_path, 1e-6)
    spl = float(success) * shortest_path / denom
    # soft-SPL: progress toward goal scaled by path efficiency
    start_dist = max(shortest_path, 1e-6)
    progress = max(0.0, 1.0 - distance_to_goal / start_dist)
    soft_spl = progress * shortest_path / denom

    cause = None
    if not success:
        cause = determine_failure_cause(
            called_stop=called_stop,
            timeout=steps >= max_steps,
            target_detected=target_detected,
            target_seen=target_seen,
            close=distance_to_goal <= success_radius,
        )
    return EpisodeResult(
        success=success,
        spl=spl,
        soft_spl=soft_spl,
        distance_to_goal=distance_to_goal,
        steps=steps,
        path_length=path_length,
        called_stop=called_stop,
        target_detected=target_detected,
        target_seen=target_seen,
        collisions=collisions,
        failure_cause=cause,
    )


def determine_failure_cause(
    *,
    called_stop: bool,
    timeout: bool,
    target_detected: bool,
    target_seen: bool,
    close: bool,
) -> str:
    """Reduced form of the reference's taxonomy (episode_stats_logger.py:44-72):

    - false_positive: stopped at something that was not the target
    - bad_stop_true_positive: detected the real target but stopped too early
    - timeout_true_positive: detected the real target but ran out of steps
    - false_negative: saw the target but never detected it
    - never_saw_target: exploration never brought the target into view
    """
    if called_stop and not close:
        return "false_positive" if not (target_detected and target_seen) else "bad_stop_true_positive"
    if timeout and target_detected and target_seen:
        return "timeout_true_positive"
    if timeout and target_seen:
        return "false_negative"
    if timeout:
        return "never_saw_target"
    if called_stop and close:
        return "stopped_near_goal_unsuccessfully"
    return "unknown"


def aggregate(results) -> dict:
    n = max(len(results), 1)
    agg = {
        "episodes": len(results),
        "success_rate": sum(r.success for r in results) / n,
        "spl": sum(r.spl for r in results) / n,
        "soft_spl": sum(r.soft_spl for r in results) / n,
        "avg_steps": sum(r.steps for r in results) / n,
    }
    causes: dict = {}
    for r in results:
        if r.failure_cause:
            causes[r.failure_cause] = causes.get(r.failure_cause, 0) + 1
    agg["failure_causes"] = causes
    return agg
