from hmmc_tpu.train.optimization import (
    bert_adam, build_optimizer, decay_mask, lr_tree, SCHEDULES)
from hmmc_tpu.train.trainer import (
    FinetuneState, PretrainState, make_finetune_step, make_pretrain_step)

__all__ = [
    "bert_adam", "build_optimizer", "decay_mask", "lr_tree", "SCHEDULES",
    "FinetuneState", "PretrainState", "make_finetune_step",
    "make_pretrain_step",
]
