from .metrics import MetricAccumulator, the_metric  # noqa: F401
from .retrieval import (  # noqa: F401
    extract_features, retrieval_recall, compute_irtr_recall,
)
from .downstream import (  # noqa: F401
    vqa_predictions, write_vqa_submission, nlvr2_split_update,
)
