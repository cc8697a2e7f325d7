.PHONY: test bench demo native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

demo:
	python scripts/run_demo.py --workdir demo_workspace

native:
	$(MAKE) -C native

clean:
	rm -rf demo_workspace nb_workspace .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
