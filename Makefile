# Development targets (the reference ships Makefile templates per recipe;
# recipes here write their own via contrib/cb/io.SimpleMakefile)

test:
	python -m pytest tests/ -x -q

test-all:  ## incl. the slow end-to-end recipe smokes + package doctests
	python -m pytest -q -m ""

test-slow:  ## the 17 opt-in end-to-end recipe train->evaluate smokes
	python -m pytest tests/ -q -m slow

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python __graft_entry__.py

smoke: ## run every recipe end-to-end on synthetic data
	python -m padertorch_tpu.contrib.examples.toy_examples.mnist.mnist_example
	python -m padertorch_tpu.contrib.examples.source_separation.pit.train --storage_root /tmp/smoke --synthetic --epochs 1 --units 32 --layers 1
	python -m padertorch_tpu.contrib.examples.source_separation.tasnet.train --storage_root /tmp/smoke --synthetic --epochs 1 --small
	python -m padertorch_tpu.contrib.examples.speaker_classification.supervised.train --storage_root /tmp/smoke --synthetic --epochs 1
	python -m padertorch_tpu.contrib.examples.speech_enhancement.mask_estimator.train --storage_root /tmp/smoke --synthetic --epochs 1 --num_units 64
	python -m padertorch_tpu.contrib.examples.audio_synthesis.wavenet.train --storage_root /tmp/smoke --synthetic --epochs 1 --small
	python -m padertorch_tpu.contrib.examples.sound_recognition.audio_tagging.train --storage_root /tmp/smoke --synthetic --epochs 1
	python -m padertorch_tpu.contrib.examples.source_localization.distance_estimator.train --storage_root /tmp/smoke --synthetic --epochs 1

.PHONY: test test-all test-slow bench dryrun smoke
