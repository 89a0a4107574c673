.PHONY: test check check-big difftest bench stress smoke

test:
	python -m pytest tests/ -q

check:
	python tools/check_oracle.py /root/testdata/sf0.01

check-big:
	python tools/check_oracle.py /root/testdata/sf0.1

difftest:
	python tools/difftest.py

bench:
	python bench.py

stress:
	python tools/stress.py all 10

smoke:
	python -c "from pyspark.sql import SparkSession; import __spark_entry__ as m; \
	s = SparkSession.builder.master('local[4]').getOrCreate(); \
	print(len(m.entry(s).collect()), 'rows;', len(m.queries()), 'queries')"
