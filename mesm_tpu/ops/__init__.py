from .span import (
    span_xx_to_cxw,
    span_cxw_to_xx,
    temporal_iou,
    generalized_temporal_iou,
    pairwise_temporal_iou,
    pairwise_generalized_temporal_iou,
    np_temporal_iou_cross,
    np_temporal_iou_paired,
)
from .masking import (
    lengths_to_mask,
    masked_mean,
    masked_softmax_logits,
    l2_normalize,
)
from .lsap import solve_lsap, solve_lsap_batch
from .matcher import hungarian_match, single_target_match
