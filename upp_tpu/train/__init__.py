from .optim import (build_schedule, build_optimizer, peft_detect,
                    trainable_mask, weight_decay_mask)
from .metrics import (cross_entropy_loss_acc, AccMetric, CDMetric,
                      seg_miou_metrics)
