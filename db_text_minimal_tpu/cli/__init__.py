"""Entry-point CLIs mirroring the reference Makefile targets
(train / test / make_eval / ioueval / deteval / ocr / webcam / serve)."""
