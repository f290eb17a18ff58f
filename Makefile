.PHONY: test oracle oracle-smoke bench smoke

test:
	python -m pytest tests/ -q

oracle:
	python tools/check_oracle.py

oracle-smoke:
	python tools/check_oracle.py --sf /root/testdata/sf0.001

bench:
	python bench.py 2>/dev/null

smoke:
	python -c "import __spark_entry__ as e; from etl_for_dumdums_spark.session import get_spark; print(e.entry(get_spark('smoke')).count(), 'rows')"
