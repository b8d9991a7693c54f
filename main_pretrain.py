"""MoCo pretraining entry (reference: main_pretrain.py). Adds the contrast
flags --contrast_num_negative/--contrast_momentum/--contrast_temperature
(reference main_pretrain.py:61-63); everything else matches
main_task_retrieval.py.

Example:
  python main_pretrain.py --do_pretrain --dataset bird --language chinese \
      --use_temp --use_frame_fea --frame_sample_len dynamic \
      --contrast_num_negative 1024 --contrast_momentum 0.99 \
      --data_dir /data --output_dir out/pretrain
"""

from hmmc_tpu.cli import get_args
from hmmc_tpu.runner import main

if __name__ == "__main__":
    args = get_args("HMMC-TPU Pretraining")
    if not args.do_pretrain:
        raise SystemExit("main_pretrain.py requires --do_pretrain")
    main(args)
