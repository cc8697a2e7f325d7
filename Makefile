.PHONY: test bench demo native clean real-data real-data-check

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# Real-dataset parity run: drop the Kaggle CSVs into data/instacart/ and an
# all-MiniLM-L6-v2 checkpoint into models/all-MiniLM-L6-v2/, then run this —
# prep -> warm-started 5-epoch train -> per-epoch table vs BASELINE.md
# (written to REAL_RESULTS.md). See scripts/real_data_run.py.
real-data:
	python scripts/real_data_run.py

real-data-check:
	python scripts/real_data_run.py --check

demo:
	python scripts/run_demo.py --workdir demo_workspace

native:
	$(MAKE) -C native

clean:
	rm -rf demo_workspace nb_workspace .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
