from aladin_tpu.eval.recall import (  # noqa: F401
    compute_recall,
    rank_metrics,
    recall_1k_5fold,
    recall_metrics,
)
from aladin_tpu.eval.retrieval import evaluate_alignment_head, i2t_from_scores, t2i_from_scores  # noqa: F401
