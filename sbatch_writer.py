"""Slurm submission-script generator for the downstream evaluation fan-out
(/root/reference/pase/sbatch_writer.py:3-91): emits one sbatch file per
probe task (TIMIT FER, speaker-ID, language-ID, emotion) for a given
pretrained checkpoint.

  python sbatch_writer.py --fe_cfg cfg/frontend/PASE+.cfg \\
      --fe_ckpt ckpt/FE_e399.npz --out_dir sbatch/ \\
      --partition gpu --time 12:00:00
"""

import argparse
import os

TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --partition={partition}
#SBATCH --time={time}
#SBATCH --output={out_dir}/{name}.%j.out
#SBATCH --cpus-per-task={cpus}
{extra}
cd {workdir}
{cmd}
"""

TASKS = {
    "timit_fer": ("frames", "--num_classes 48 --hidden 1024"),
    "spk_id": ("utt", "--mode avg_concat --hidden 256"),
    "lang_id": ("utt", "--mode avg_concat --hidden 256"),
    "emorec": ("utt", "--mode avg_concat --hidden 256"),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fe_cfg", required=True)
    p.add_argument("--fe_ckpt", required=True)
    p.add_argument("--out_dir", default="sbatch")
    p.add_argument("--data_root", default="data")
    p.add_argument("--partition", default="compute")
    p.add_argument("--time", default="12:00:00")
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--extra", default="")
    p.add_argument("--tasks", nargs="+", default=list(TASKS))
    opts = p.parse_args()
    os.makedirs(opts.out_dir, exist_ok=True)
    workdir = os.getcwd()
    for task in opts.tasks:
        mode, args = TASKS[task]
        cmd = (f"python run_probe.py {mode} --fe_cfg {opts.fe_cfg} "
               f"--fe_ckpt {opts.fe_ckpt} "
               f"--train_list {opts.data_root}/{task}_train.lst "
               f"--test_list {opts.data_root}/{task}_test.lst "
               f"--data_root {opts.data_root} {args} "
               f"--out {opts.out_dir}/{task}_metrics.json")
        script = TEMPLATE.format(name=f"pase_{task}",
                                 partition=opts.partition, time=opts.time,
                                 out_dir=opts.out_dir, cpus=opts.cpus,
                                 extra=opts.extra, workdir=workdir, cmd=cmd)
        path = os.path.join(opts.out_dir, f"{task}.sbatch")
        with open(path, "w") as f:
            f.write(script)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
