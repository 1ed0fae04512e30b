from aladin_tpu.eval.recall import (  # noqa: F401
    compute_recall,
    rank_metrics,
    recall_1k_5fold,
    recall_metrics,
)
from aladin_tpu.eval.retrieval import (  # noqa: F401
    evaluate_alignment_head,
    i2t_from_scores,
    retrieval_metrics_from_scores,
    t2i_from_scores,
)
