"""physics_informed_image_segmentation_tpu — TPU-native PDE-constrained segmentation.

A from-scratch JAX / Flax / Pallas / pjit framework with the
capabilities of the reference ``Physics_informed_image_segmentation``
codebase (PDE-regularized U-Net cell segmentation, two-stage training,
ablation/sensitivity studies, statistical evaluation), re-designed for
TPU: NHWC Flax models, fused Pallas stencil kernels for the physics
loss, jit/scan training with on-device metrics, and mesh-sharded
data/spatial parallelism.

The flat public API below mirrors the reference's 33-name surface
(/root/reference/src/__init__.py:35-67) with idiomatic JAX equivalents;
submodules (`ops`, `models`, `data`, `train`, `parallel`, `experiments`,
`utils`) carry the full TPU-native API.
"""

from . import data, experiments, models, ops, parallel, train, utils  # noqa: F401
from .compat import (  # noqa: F401
    DiceBCELoss,
    DiceBCEPDELoss,
    PDERegularization,
    create_pde_regularization,
    evaluate_on_test_set,
)

# --- reference public-API parity (functional equivalents) ---
from .data import CocoSegmentationSource as CellSegmentationDataset  # noqa: F401
from .experiments import (  # noqa: F401
    AblationConfig,
    evaluate_and_compare,
    run_ablation_study,
    run_ablation_variant,
    run_repeated_evaluations,
)
from .models import UNet, count_parameters, mish  # noqa: F401
from .ops.losses import dice_bce_loss, dice_bce_pde_loss  # noqa: F401
from .ops.metrics import (  # noqa: F401
    boundary_f1_per_sample,
    dice_score,
    dice_score_per_sample,
    extract_boundaries,
    hausdorff_distance_np,
    iou_score,
    iou_score_per_sample,
)
from .ops.pde import (  # noqa: F401
    laplacian,
    pde_residual,
    pde_residual_loss,
    phase_field_loss,
    reaction_term,
)
from .ops.stats import (  # noqa: F401
    compare_models_statistically,
    compute_statistics,
    format_metric_report,
)
from .train import (  # noqa: F401
    EarlyStopping,
    LossConfig,
    evaluate_model,
    evaluate_on_dataset,
    train,
    train_stage,
    validate,
)
from .utils.plot import (  # noqa: F401
    plot_all_metrics,
    plot_training_curves,
    plot_training_results,
    plot_two_stage_comparison,
)

__version__ = "0.3.0"



__all__ = [
    # data
    "CellSegmentationDataset",
    # model
    "UNet",
    "mish",
    "count_parameters",
    # losses / physics
    "dice_bce_loss",
    "dice_bce_pde_loss",
    "LossConfig",
    "laplacian",
    "reaction_term",
    "pde_residual",
    "pde_residual_loss",
    "phase_field_loss",
    # metrics
    "dice_score",
    "dice_score_per_sample",
    "iou_score",
    "iou_score_per_sample",
    "boundary_f1_per_sample",
    "extract_boundaries",
    "hausdorff_distance_np",
    # training
    "train",
    "train_stage",
    "validate",
    "EarlyStopping",
    "evaluate_model",
    "evaluate_on_dataset",
    # statistics
    "compute_statistics",
    "compare_models_statistically",
    "format_metric_report",
    # experiments
    "AblationConfig",
    "run_ablation_variant",
    "run_ablation_study",
    "evaluate_and_compare",
    "run_repeated_evaluations",
    # plotting
    "plot_training_curves",
    "plot_two_stage_comparison",
    "plot_all_metrics",
    "plot_training_results",
]

# --- drop-in aliases matching the reference's exact function names
# (/root/reference/src/__init__.py:35-67) for users migrating code.
# Together with the `compat` classes above, ALL 31 reference exports are
# importable from this package under their reference names
# (tests/test_compat.py pins this list). ---
from .compat import compute_boundary_f1  # noqa: F401  (single-sample [0,0] form)

compute_dice_score = dice_score
compute_dice_score_batch = dice_score_per_sample
compute_iou = iou_score
compute_iou_batch = iou_score_per_sample
compute_boundary_f1_batch = boundary_f1_per_sample
compute_hausdorff_distance = hausdorff_distance_np
__all__ += [
    "compute_dice_score",
    "compute_dice_score_batch",
    "compute_iou",
    "compute_iou_batch",
    "compute_boundary_f1",
    "compute_boundary_f1_batch",
    "compute_hausdorff_distance",
    # compat classes (reference drop-in names)
    "DiceBCELoss",
    "DiceBCEPDELoss",
    "PDERegularization",
    "create_pde_regularization",
    "evaluate_on_test_set",
]
