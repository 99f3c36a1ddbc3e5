# parity: reference Makefile static checks + test targets
# (reference Makefile:20-42: sh-check + compose-check + docker-check;
# tools/deploy_check.py falls back to in-repo validators when the docker
# CLI is absent)
.PHONY: test test-fast bench check sh-check compose-check dockerfile-check lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not integration"

bench:
	python bench.py

sh-check compose-check dockerfile-check:
	python -c "import sys; sys.path.insert(0, '.'); \
	  from tools import deploy_check as d; \
	  errs = d.$(subst -,_,$@)(); \
	  [print('ERROR:', e, file=sys.stderr) for e in errs]; \
	  sys.exit(1 if errs else 0)"

check:
	python tools/deploy_check.py
	python -m compileall -q boa_tpu

lint:
	python -m compileall -q boa_tpu
