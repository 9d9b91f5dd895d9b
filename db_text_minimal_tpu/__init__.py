"""db_text_minimal_tpu — a TPU-native (JAX/XLA/Pallas/pjit) scene-text
detection + recognition framework with the capabilities of
huyhoang17/DB_text_minimal (DBNet, arXiv:1911.08947).

Package layout (see SURVEY.md §7 for the reference layer map this covers):

- ``config``       — single YAML config system for all entry points
                     (replaces the reference's hydra train config at
                     ``src/train.py:322`` + argparse CLIs).
- ``models``       — Flax NHWC DBNet: ResNet backbones (``src/modules/resnet.py``),
                     FPN neck (``src/modules/segmentation_body.py``), DB head
                     (``src/modules/segmentation_head.py``), plus an in-tree
                     recognition model (CRNN/attention, the capability consumed
                     from ``clova_ocr`` at ``src/test_ocr.py:267-282``).
- ``ops``          — Pallas TPU kernels and the first-party C++ host geometry
                     library (Clipper/GEOS/OpenCV-contour equivalents, SURVEY §2b).
- ``losses``       — DB loss: OHEM-balanced BCE + dice + masked L1
                     (``src/losses.py``).
- ``lr_schedules`` — warmup-poly + reduce-on-plateau (``src/lr_schedulers.py``).
- ``data``         — 4 dataset parsers, GT label generation, augmentation,
                     host-sharded input pipeline (``src/data_loaders.py``,
                     ``src/db_transforms.py``).
- ``postprocess``  — prob map → polygons/boxes (``src/postprocess.py``).
- ``metrics``      — pixel metrics, QuadMetric, IoU-Pascal, DetEval
                     (``src/text_metrics.py``, ``src/iou.py``, ``src/deteval.py``).
- ``parallel``     — device mesh + sharding strategies (new; the reference is
                     single-device, SURVEY §2c).
- ``train``        — trainer, checkpoints (``src/train.py``).
- ``serve``        — AOT export + REST serving (``src/save_jit.py``,
                     ``src/db_handler.py``, ``src/ts_request.py``).
- ``cli``          — entry points mirroring the reference Makefile targets.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS=cpu even when a platform plugin (the axon TPU runtime)
# would otherwise win platform selection: the env var alone is NOT enough in
# this environment — ``JAX_PLATFORMS=cpu python -m db_text_minimal_tpu.cli.X``
# silently ran on the TPU. jax.config.update works as long as the backend is
# not initialized yet (same pattern as ``__graft_entry__.dryrun_multichip``
# and ``tests/conftest.py``).
#
# Deliberately applied ONLY for "cpu" (the restricting direction): scripts
# that explicitly pin ``jax.config.update("jax_platforms", "cpu")`` before
# importing this package run under env JAX_PLATFORMS=axon, and an
# unconditional override would silently flip their CPU-intended work back
# onto the tunneled TPU (jax.config records no "explicitly set" bit to
# detect that case).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        del _jax
    except Exception:  # backend already initialized, or jax absent
        pass
del _os
