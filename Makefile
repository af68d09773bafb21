# Gate sequence for graphlab_spark. `make gate` runs everything the
# driver checks, in order of cost; each target is standalone.

SF_DIR ?= /root/testdata/sf0.01

.PHONY: test oracles audit bench scaling verify gate

test:            ## full pytest suite (~5 min)
	python -m pytest tests/ -x -q

oracles:         ## every queries() entry vs its DuckDB oracle at $(SF_DIR)
	python tools/check_oracles.py $(SF_DIR)

audit:           ## physical-plan audit (pushdown/pruning/broadcast/salt)
	python tools/explain_audit.py $(SF_DIR)

bench:           ## headline numbers at sf0.1 local[32]
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

scaling:         ## N vs 4N efficiency + hardware control -> BENCH/BASELINE.md
	SCALING_REPEATS=2 python tools/scaling_bench.py 300000

verify:          ## spark-submit end-to-end drive (P/R vs golden, resume probe)
	rm -rf /tmp/verify_kg /tmp/graphlab_spark.zip
	zip -qr /tmp/graphlab_spark.zip graphlab_spark
	spark-submit --py-files /tmp/graphlab_spark.zip tools/drive_kg.py /tmp/verify_kg 200 8 2>&1 | grep -aE "^VERIFY"
	spark-submit --py-files /tmp/graphlab_spark.zip tools/drive_kg.py /tmp/verify_kg 200 4 2>&1 | grep -aE "^VERIFY"

gate: test oracles audit verify   ## the pre-driver gate (excludes the long scaling run)
