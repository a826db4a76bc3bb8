from simhand_tpu.losses.contrastive import (
    nt_xent,
    weighted_nt_xent,
    pos_weighted_nt_xent,
    neg_weighted_nt_xent,
)
from simhand_tpu.losses.weights import (
    linear_weights,
    nonlinear_weights,
    apply_pca,
)
from simhand_tpu.losses.supervised import (
    l1_loss_25d,
    loss_3d,
    epe_metrics,
)
from simhand_tpu.losses.pallas_ntxent import (
    nt_xent_pallas,
    weighted_nt_xent_pallas,
    make_sharded_nt_xent_pallas,
)
