"""Evaluation: OKS-based COCO keypoint AP and the student eval engine."""

from .cocoeval import KeypointEvaluator, KPT_OKS_SIGMAS, STATS_NAMES  # noqa: F401
