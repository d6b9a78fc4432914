from bayesod_tpu.bayes.moments import (
    AnchorPosteriors,
    aggregate,
    mc_box_moments,
    mean_categorical,
)
from bayesod_tpu.bayes.clustering import (
    Clusters,
    greedy_nms,
    greedy_nms_with,
    iou_affinity_clustering,
)
from bayesod_tpu.bayes.fusion import (
    FusedDetections,
    category_prior_from_frequencies,
    fuse_clusters,
    inv4x4_psd,
)

__all__ = [
    "AnchorPosteriors",
    "aggregate",
    "mc_box_moments",
    "mean_categorical",
    "Clusters",
    "greedy_nms",
    "greedy_nms_with",
    "iou_affinity_clustering",
    "FusedDetections",
    "category_prior_from_frequencies",
    "fuse_clusters",
    "inv4x4_psd",
]
