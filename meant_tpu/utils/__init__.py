from .metrics import F1Metrics, binary_auroc, confusion_delta, \
    metrics_from_confusion

__all__ = ["F1Metrics", "binary_auroc", "confusion_delta",
           "metrics_from_confusion"]
