"""Demo training run: synthetic dataset, real TPU, full pipeline.
Trains the detector, evaluates P/R/F, renders heatmap/poly/rect assets,
and runs the offline eval CLIs. Writes results to demo/."""
import json, os, time, sys
import numpy as np
import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(ROOT)
sys.path.insert(0, ROOT)

from db_text_minimal_tpu.config import load_config
from db_text_minimal_tpu.data.synthetic import generate
from db_text_minimal_tpu.data import DataLoader, TotalTextDataset
from db_text_minimal_tpu.train import Trainer

out = os.path.join(ROOT, "demo")
data_dir = os.path.join(out, "data")
section = generate(data_dir, n_train=32, n_test=8, size=640, seed=13)
cfg = load_config(overrides={
    "meta": {"root_dir": out},
    "hps": {"img_size": 640, "batch_size": 8, "test_batch_size": 1,
            "no_epochs": 100, "log_iter": 40},
    "data": {"synthetic": section},
    "dataset": {"name": "synthetic"},
    "metric": {"thred_text_score": 0.25, "prob_threshold": 0.5,
               "unclip_ratio": 1.5, "is_output_polygon": True},
    "logging": {"logger_file": None},
})
tl = DataLoader(TotalTextDataset(section["train_dir"], section["train_gt_dir"],
                                 ["###"], is_training=True, image_size=640),
                8, shuffle=True)
vl = DataLoader(TotalTextDataset(section["test_dir"], section["test_gt_dir"],
                                 ["###"], is_training=False, image_size=640),
                1)
trainer = Trainer(cfg, tl, vl)
t0 = time.time()
state, history = trainer.fit()
train_time = time.time() - t0
print(f"training took {train_time:.0f}s")
last = history[-1]
print("final:", last)
with open(os.path.join(out, "history.json"), "w") as f:
    json.dump({"history": history, "train_time_s": train_time}, f, indent=2)
