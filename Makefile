# Build/launch glue mirroring the reference Makefile targets (SURVEY.md §1 L8)
# with the same canonical flag values (reference Makefile:6-29).

cwd := $(shell pwd)
SHELL := /bin/bash

# offline eval protocol constants (reference Makefile:6-14)
iou := 0.4
area := 0.8
tp := 0.4
tr := 0.8

# canonical inference thresholds (reference Makefile:26-29)
thresh := 0.25
box_thresh := 0.50
unclip_ratio := 1.5

model_path := $(cwd)/models/best_cp.ckpt
pruned_path := $(cwd)/models/best_cp_pruned.ckpt
rec_model_path := $(cwd)/models/rec.ckpt
img_path := $(cwd)/assets/foo.jpg
save_dir := $(cwd)/assets

.PHONY: lint test train export test-heatmap test-poly test-rect test-all \
	make-eval ioueval deteval serve serve-stop serve-request bench \
	synthetic test-pp test-folder test-webcam test-video \
	hard-bench quality-bench pretrain-backbone tpu-gate train-rec rec-bench prune

lint:
	python -m compileall -q db_text_minimal_tpu

test:
	python -m pytest tests/ -x -q

train:
	python -m db_text_minimal_tpu.cli.train

synthetic:
	python -m db_text_minimal_tpu.cli.make_synthetic ./data/synthetic

# quality-parity proxy benchmark (docs/QUALITY_PARITY.md)
hard-bench:
	python -m db_text_minimal_tpu.cli.make_synthetic ./data/hard_bench --hard

pretrain-backbone:
	python -m db_text_minimal_tpu.cli.pretrain_backbone \
		--train_dir ./data/hard_bench/train_images \
		--gt_dir ./data/hard_bench/train_gts \
		--out ./models/backbone_pretext.pth

quality-bench:
	python -m db_text_minimal_tpu.cli.quality_bench \
		--data_dir ./data/hard_bench \
		--out ./demo/hard_bench/metrics_scratch.json --epochs 10 \
		--batch_size 16 --save_checkpoint ./models/hard_bench.ckpt

test-heatmap:
	python -m db_text_minimal_tpu.cli.test \
		--image_path $(img_path) --model_path $(model_path) \
		--save_dir $(save_dir) --heatmap True --prob_thred 0.5

test-poly:
	python -m db_text_minimal_tpu.cli.test \
		--image_path $(img_path) --model_path $(model_path) \
		--save_dir $(save_dir) --thresh $(thresh) \
		--box_thresh $(box_thresh) --unclip_ratio $(unclip_ratio) \
		--is_output_polygon True

test-rect:
	python -m db_text_minimal_tpu.cli.test \
		--image_path $(img_path) --model_path $(model_path) \
		--save_dir $(save_dir) --thresh $(thresh) \
		--box_thresh $(box_thresh) --unclip_ratio $(unclip_ratio) \
		--is_output_polygon False

test-all: test-heatmap test-poly test-rect

make-eval:
	python -m db_text_minimal_tpu.cli.make_eval \
		--image_dir ./data/test_images --gt_dir ./data/test_gts \
		--model_path $(model_path) --thresh 0.3 --box_thresh 0.5

ioueval:
	python -m db_text_minimal_tpu.cli.ioueval --iou $(iou) --area $(area)

deteval:
	python -m db_text_minimal_tpu.cli.deteval --tp $(tp) --tr $(tr)

# serving (reference Makefile:71-93 ts-* targets)
export:
	python -m db_text_minimal_tpu.cli.export --model_path $(model_path) --out $(cwd)/models/db.stablehlo

serve:
	python -m db_text_minimal_tpu.serve.server \
		--model_path $(model_path) --port 8080 &

serve-stop:
	pkill -f db_text_minimal_tpu.serve.server || true

serve-request:
	python -m db_text_minimal_tpu.serve.client \
		--image_path $(img_path) --host localhost --port 8080

# full OCR pipeline (reference Makefile:98-131)
test-pp:
	python -m db_text_minimal_tpu.cli.ocr \
		--img_path $(img_path) --out_path ./tmp/ocr_out.jpg \
		--det_model_path $(model_path) --saved_model $(rec_model_path) \
		--Transformation None --FeatureExtraction ResNet \
		--SequenceModeling BiLSTM --Prediction Attn

test-folder:
	python -m db_text_minimal_tpu.cli.ocr \
		--img_folder ./tmp/reconized --saved_model $(rec_model_path) \
		--Transformation None --FeatureExtraction ResNet \
		--SequenceModeling BiLSTM --Prediction Attn

test-webcam:
	python -m db_text_minimal_tpu.cli.webcam --show_video --per_frame 1 \
		--det_model_path $(model_path) --saved_model $(rec_model_path)

test-video:
	python -m db_text_minimal_tpu.cli.webcam \
		--video_path ./tmp/in.mp4 --per_frame 1 \
		--det_model_path $(model_path)

bench:
	python bench.py

# real-chip Pallas kernel gate; appends a pass record to demo/tpu_gate.json
tpu-gate:
	python tpu_gate.py

# structured channel pruning (reference TODO): emits <out>.widths.json
prune:
	python -m db_text_minimal_tpu.cli.prune \
		--checkpoint $(model_path) --out $(pruned_path) \
		--backbone_keep 0.5 --fpn_inner_keep 0.75 --fpn_out_keep 0.5

# train the in-tree recognizer on exported word crops (labels.txt format)
train-rec:
	python -m db_text_minimal_tpu.cli.train_rec \
		--crop_dir $(crop_dir) --out $(rec_model_path) --epochs 12

# recognition word accuracy + OCR end-to-end benchmarks (demo/ocr/*.json)
rec-bench:
	python -m db_text_minimal_tpu.cli.rec_bench --mode rec \
		--data_dir $(data_dir) --saved_model $(rec_model_path) \
		--out demo/ocr/rec_accuracy.json
	python -m db_text_minimal_tpu.cli.rec_bench --mode e2e \
		--data_dir $(data_dir) --saved_model $(rec_model_path) \
		--det_model_path $(model_path) --out demo/ocr/ocr_e2e.json
