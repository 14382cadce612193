# Developer entry points (the reference drives style/test via its Makefile)
.PHONY: test test-fast bench install smoke clean

test:  # fast tier (default): slow-marked e2e/mesh/backbone tests deselected
	python -m pytest tests/ -q

test-full:  # everything, ~25 min single-process
	python -m pytest tests/ -q -m ""

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_pipeline_e2e.py \
		--ignore=tests/test_video_mot_e2e.py --ignore=tests/test_lmsfc_model.py

bench:
	python bench.py

install:
	bash scripts/install.sh

smoke:
	bash scripts/tests/smoke.sh

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf .pytest_cache
