from .criterion import CriterionConfig, compute_losses
