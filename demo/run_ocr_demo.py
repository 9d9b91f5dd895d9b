"""Full-OCR demo: train detector + recognizer on synthetic glyph text, then
run the end-to-end pipeline and score the transcriptions.

Writes demo/ocr/{metrics.json, ocr_result.jpg}. Run on the TPU chip."""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(ROOT)
sys.path.insert(0, ROOT)

from db_text_minimal_tpu.config import load_config
from db_text_minimal_tpu.data import DataLoader, TotalTextDataset
from db_text_minimal_tpu.data.synthetic import (export_word_crops,
                                                generate_glyphs)
from db_text_minimal_tpu.data.parsers import load_totaltext
from db_text_minimal_tpu.train import Trainer
from db_text_minimal_tpu.cli import ocr as ocr_cli
from db_text_minimal_tpu.cli import train_rec

out = os.path.join(ROOT, "demo", "ocr")
os.makedirs(out, exist_ok=True)
section = generate_glyphs(os.path.join(out, "data"), n_train=24, n_test=6,
                          seed=21)

# 1) detector
cfg = load_config(overrides={
    "meta": {"root_dir": out},
    "hps": {"img_size": 640, "batch_size": 8, "test_batch_size": 1,
            "no_epochs": 30, "log_iter": 40},
    "data": {"synthetic": section},
    "dataset": {"name": "synthetic"},
    "logging": {"logger_file": None},
})
tl = DataLoader(TotalTextDataset(section["train_dir"],
                                 section["train_gt_dir"], ["###"],
                                 is_training=True, image_size=640,
                                 compact_dtypes=True), 8, shuffle=True)
vl = DataLoader(TotalTextDataset(section["test_dir"],
                                 section["test_gt_dir"], ["###"],
                                 is_training=False, image_size=640), 1)
t0 = time.time()
trainer = Trainer(cfg, tl, vl)
trainer.fit()
print(f"detector trained in {time.time()-t0:.0f}s")
det_ckpt = os.path.join(out, "models", "best_hmean_cp.ckpt")

# 2) recognizer on GT crops
crop_dir = export_word_crops(section, os.path.join(out, "crops"))
rec_ckpt = os.path.join(out, "models", "rec.ckpt")
t0 = time.time()
train_rec.main(train_rec.load_args([
    "--crop_dir", crop_dir, "--out", rec_ckpt, "--epochs", "60",
    "--batch_size", "32", "--character", "0123456789",
    "--FeatureExtraction", "VGG", "--SequenceModeling", "BiLSTM",
    "--Prediction", "CTC"]))
print(f"recognizer trained in {time.time()-t0:.0f}s")

# 3) end-to-end OCR on a test image + transcription accuracy
test_fps, test_anns = load_totaltext(section["test_dir"],
                                     section["test_gt_dir"])
total_words = 0
correct = 0
sample_results = None
for idx, (fp, ann) in enumerate(zip(test_fps, test_anns)):
    opt = ocr_cli.load_args([
        "--img_path", fp, "--det_model_path", det_ckpt,
        "--saved_model", rec_ckpt,
        "--out_path", os.path.join(out, "ocr_result.jpg")
        if idx == 0 else None,
        "--thresh", "0.25", "--box_thresh", "0.4",
        "--character", "0123456789",
        "--Transformation", "None", "--FeatureExtraction", "VGG",
        "--SequenceModeling", "BiLSTM", "--Prediction", "CTC"])
    results = ocr_cli.main(opt)
    if idx == 0:
        sample_results = results
    gt_texts = {item["text"] for item in ann}
    total_words += len(gt_texts)
    for r in results:
        if r["pred"] in gt_texts:
            correct += 1
            gt_texts.discard(r["pred"])

acc = correct / max(total_words, 1)
print(f"end-to-end word accuracy: {correct}/{total_words} = {acc:.2%}")
print("sample:", [(r["pred"], round(r["score"], 3))
                  for r in (sample_results or [])])
with open(os.path.join(out, "metrics.json"), "w") as f:
    json.dump({"word_accuracy": acc, "correct": correct,
               "total": total_words}, f, indent=2)
