# parity: reference Makefile static checks + test targets
.PHONY: test test-fast bench compose-check lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not integration"

bench:
	python bench.py

compose-check:
	docker compose -f deploy/docker-compose.yml config -q

lint:
	python -m compileall -q boa_tpu
