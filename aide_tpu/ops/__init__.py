from aide_tpu.ops.losses import (  # noqa: F401
    cross_entropy_2d,
    dice_loss,
    soft_dice_from_probs,
    multiclass_dice_loss,
    multiclass_mse_loss,
    cem_dice_loss,
    cem_dice_loss_image,
    ce_dice_loss,
    binary_cross_entropy_2d,
    focal_loss,
    kl_bidirectional,
)
from aide_tpu.ops.metrics import (  # noqa: F401
    dice_fn,
    dice_fn_nozero,
    iou_fn,
    tp_tn_fp_fn,
    multiclass_dice_fn,
    multiclass_iou_fn,
    multiclass_accuracy_fn,
    multiclass_tp_tn_fp_fn,
    dice3d,
    iou3d,
    tp_tn_fp_fn_3d,
)
from aide_tpu.ops.tta import (  # noqa: F401
    sample_view_params,
    make_views,
    invert_views,
    sharpen,
    confidence_weightmap,
    ensemble_pseudo_labels,
)
from aide_tpu.ops.warp import augment, invert, sample_affine  # noqa: F401
from aide_tpu.ops.cc import keep_largest_connected_components  # noqa: F401
from aide_tpu.ops.schedules import (  # noqa: F401
    make_lr_schedule,
    make_optimizer,
    rate_schedule,
)
from aide_tpu.ops.coteach import (  # noqa: F401
    coteach_drop_image,
    coteach_weight_image,
    coteach_drop_region_ce,
    coteach_drop_image_drop_pixel,
    pixel_coreg_focal,
    pixel_coreg_focal_two_model,
)
