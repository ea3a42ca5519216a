# Reference CI parity (reference .github/workflows/ci.yml: lint+type+test
# gates). ruff/mypy run when installed; the stdlib AST lint and the test
# suite always run. `sweep` is the registry-wide oracle sweep with the
# vacuousness gate (slow — every entry at sf0.01); `check` stays the
# fast inner loop.
.PHONY: check lint type test sweep

check: lint type test

sweep:
	python scripts/check_correctness.py --assert-nonvacuous

lint:
	@command -v ruff >/dev/null 2>&1 && ruff check data_pipeline_spark || \
		echo "ruff not installed - stdlib lint only"
	python scripts/lint_basic.py data_pipeline_spark

type:
	@command -v mypy >/dev/null 2>&1 && mypy data_pipeline_spark || \
		echo "mypy not installed - skipping (config in pyproject.toml)"
	python -m compileall -q data_pipeline_spark tests scripts

test:
	python -m pytest tests/ -x -q
