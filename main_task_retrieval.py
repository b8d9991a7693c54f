"""Fine-tune / evaluate text-video retrieval (reference:
main_task_retrieval.py). Same flag surface; runs as ONE program over the
TPU mesh instead of torch.distributed.launch per-GPU processes.

Examples:
  python main_task_retrieval.py --do_train --dataset msrvtt \
      --language english --use_temp --use_frame_fea \
      --data_dir /data --clip_model /ckpts/ViT-B-32.pt \
      --output_dir out/msrvtt_ft
  python main_task_retrieval.py --do_eval --dataset msrvtt \
      --language english --use_temp --use_frame_fea \
      --data_dir /data --init_model out/msrvtt_ft/pytorch_model.bin.4 \
      --output_dir out/eval
"""

from hmmc_tpu.cli import get_args
from hmmc_tpu.runner import main

if __name__ == "__main__":
    main(get_args("HMMC-TPU on Retrieval Task"))
