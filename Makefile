.PHONY: test check bench smoke

test:
	python -m pytest tests/ -q

check:
	python tools/check_oracle.py /root/testdata/sf0.01

check-big:
	python tools/check_oracle.py /root/testdata/sf0.1

bench:
	python bench.py

smoke:
	python -c "from pyspark.sql import SparkSession; import __spark_entry__ as m; \
	s = SparkSession.builder.master('local[4]').getOrCreate(); \
	print(len(m.entry(s).collect()), 'rows;', len(m.queries()), 'queries')"
