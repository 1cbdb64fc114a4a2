# Packaging + local targets for the PySpark full-text engine.
#
# `make package` produces dist/hadoop_search_engine_spark.zip — the
# artifact shipped to a cluster with:
#
#   spark-submit --py-files dist/hadoop_search_engine_spark.zip \
#       jobs/build_index.py --input <documents table/path> --output <index dir>
#   spark-submit --py-files dist/hadoop_search_engine_spark.zip \
#       jobs/search.py --index <index dir> --query "person car" --k 10

PKG := hadoop_search_engine_spark
DIST := dist/$(PKG).zip

.PHONY: package test bench scaling contract clean

package:
	mkdir -p dist
	rm -f $(DIST)
	zip -qr $(DIST) $(PKG) -x '*__pycache__*'
	@echo "built $(DIST)"

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

scaling:
	python bench_scaling.py

contract:
	python tools/check_contract.py

clean:
	rm -rf dist
