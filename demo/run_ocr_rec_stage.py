"""Re-run recognizer training + end-to-end eval against the existing
glyph detector checkpoint (demo/ocr)."""
import json, os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(ROOT); sys.path.insert(0, ROOT)
from db_text_minimal_tpu.data.synthetic import export_word_crops
from db_text_minimal_tpu.data.parsers import load_totaltext
from db_text_minimal_tpu.cli import ocr as ocr_cli
from db_text_minimal_tpu.cli import train_rec

out = os.path.join(ROOT, "demo", "ocr")
section = {
    "train_dir": f"{out}/data/train_images", "test_dir": f"{out}/data/test_images",
    "train_gt_dir": f"{out}/data/train_gts", "test_gt_dir": f"{out}/data/test_gts",
    "ignore_tags": ["###"],
}
det_ckpt = os.path.join(out, "models", "best_hmean_cp.ckpt")
crop_dir = export_word_crops(section, os.path.join(out, "crops2"),
                             jitter_copies=6)
rec_ckpt = os.path.join(out, "models", "rec.ckpt")
t0 = time.time()
train_rec.main(train_rec.load_args([
    "--crop_dir", crop_dir, "--out", rec_ckpt, "--epochs", "200",
    "--batch_size", "64", "--lr", "1e-3", "--character", "0123456789",
    "--FeatureExtraction", "VGG", "--SequenceModeling", "BiLSTM",
    "--Prediction", "CTC"]))
print(f"recognizer trained in {time.time()-t0:.0f}s")

test_fps, test_anns = load_totaltext(section["test_dir"], section["test_gt_dir"])
total, correct = 0, 0
sample = None
for idx, (fp, ann) in enumerate(zip(test_fps, test_anns)):
    opt = ocr_cli.load_args([
        "--img_path", fp, "--det_model_path", det_ckpt,
        "--saved_model", rec_ckpt,
        "--out_path", os.path.join(out, "ocr_result.jpg") if idx == 0 else None,
        "--thresh", "0.25", "--box_thresh", "0.4",
        "--character", "0123456789",
        "--Transformation", "None", "--FeatureExtraction", "VGG",
        "--SequenceModeling", "BiLSTM", "--Prediction", "CTC"])
    results = ocr_cli.main(opt)
    if idx == 0: sample = results
    gt_texts = {item["text"] for item in ann}
    total += len(gt_texts)
    for r in results:
        if r["pred"] in gt_texts:
            correct += 1; gt_texts.discard(r["pred"])
acc = correct / max(total, 1)
print(f"end-to-end word accuracy: {correct}/{total} = {acc:.2%}")
print("sample:", [(r["pred"], round(r["score"],3)) for r in (sample or [])])
json.dump({"word_accuracy": acc, "correct": correct, "total": total},
          open(os.path.join(out, "metrics.json"), "w"), indent=2)
