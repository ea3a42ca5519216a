# Reference CI parity (reference .github/workflows/ci.yml: lint+type+test
# gates). ruff/mypy run when installed; the stdlib AST lint and the test
# suite always run.
.PHONY: check lint type test

check: lint type test

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
