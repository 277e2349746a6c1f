# Test tiers (see pyproject.toml [tool.pytest.ini_options]):
#   make test       — default tier (-m 'not slow'), ~25 min on one CPU
#   make test-full  — EVERYTHING incl. torch-parity oracles, Pallas conv
#                     goldens, slab chains, virtual-mesh dryruns (~40 min).
#                     This is the pre-release gate: a plain `pytest` run
#                     skips the slow tier, so parity coverage only counts
#                     when this target is green.
#   make test-slow  — just the slow tier
.PHONY: test test-full test-slow

test:
	python -m pytest tests/ -x -q

test-full:
	python -m pytest tests/ -x -q -m ""

test-slow:
	python -m pytest tests/ -x -q -m slow
