from simhand_tpu.finetune.detnet import DetNet
from simhand_tpu.finetune.detloss import det_loss
