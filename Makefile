# Dev-UX targets (mirrors the reference's root Makefile: dev/test/ingest/
# rebuild-index/eval-*, reference: Makefile:1-120).  No docker services are
# needed: catalog is sqlite, indexes are device-resident with on-disk
# snapshots.

PY ?= python
DATA_ROOT ?= ./data
CORPUS ?= ./eval_corpus
SERVICE_URL ?= http://127.0.0.1:17010

.PHONY: dev test test-fast test-all lint ingest rebuild-index snapshot bench \
	eval-corpus eval-exact eval-vibe eval-latency eval-report eval-all \
	dryrun-multichip native clean-data gen-api vibe-checkpoint-day

dev:  ## run the HTTP service
	$(PY) -m audio_ident_tpu.service

# PALLAS_AXON_POOL_IPS= skips TPU-plugin registration: CPU tests never
# touch the chip tunnel (and so can run while a bench occupies the chip)
test:  ## fast test suite (virtual 8-device CPU mesh)
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q -m "not slow"

test-fast:  ## <5 min smoke tier: parity + WAL + gate + service API
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q -m fast

test-all:  ## including slow parity tests
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q

lint:  ## ruff+mypy when installed; stdlib AST rule set otherwise
	$(PY) scripts/lint.py

gen-api:  ## regenerate ui/generated.d.ts from the OpenAPI spec
	$(PY) scripts/gen_api_client.py

ingest:  ## make ingest DIR=path/to/audio
	$(PY) -m audio_ident_tpu.service.cli ingest $(DIR)

rebuild-index:  ## re-derive all indexes from the raw blob store
	$(PY) -m audio_ident_tpu.service.cli rebuild-index

snapshot:
	$(PY) -m audio_ident_tpu.service.cli snapshot

bench:  ## headline fingerprint throughput on the real chip
	$(PY) bench.py

eval-corpus:  ## make eval-corpus LIB=path/to/wavs
	$(PY) scripts/build_eval_corpus.py --library $(LIB) --out $(CORPUS)

eval-exact:
	$(PY) scripts/eval_exact.py --corpus $(CORPUS) --json exact_metrics.json

eval-vibe:
	$(PY) scripts/eval_vibe.py --corpus $(CORPUS) --json vibe_metrics.json

eval-latency:  ## needs a running service (make dev)
	$(PY) scripts/eval_latency.py --corpus $(CORPUS) --url $(SERVICE_URL) \
		--json latency_metrics.json

eval-report:
	$(PY) scripts/eval_report.py --exact exact_metrics.json \
		--vibe vibe_metrics.json --latency latency_metrics.json

eval-all: eval-exact eval-report

vibe-checkpoint-day:  ## docs/CLAP_RUNBOOK.md steps 2-5 (needs CLAP_CHECKPOINT)
	@test -n "$(CLAP_CHECKPOINT)" || (echo "set CLAP_CHECKPOINT=/path/clap_audio.pt" && exit 1)
	DATA_ROOT=$(DATA) $(PY) -m audio_ident_tpu.service.cli rebuild-index $(DATA)/raw
	DATA_ROOT=$(DATA) $(PY) scripts/calibrate_vibe_threshold.py --corpus $(CORPUS) \
		--json vibe_threshold.json
	DATA_ROOT=$(DATA) $(PY) scripts/eval_vibe.py --corpus $(CORPUS) --json vibe_metrics.json
	DATA_ROOT=$(DATA) $(PY) scripts/eval_report.py --exact exact_metrics.json \
		--vibe vibe_metrics.json --latency latency_metrics.json

dryrun-multichip:  ## validate the sharded path on a virtual CPU mesh
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

native:  ## build the C++ runtime library
	$(MAKE) -C native

clean-data:  ## wipe derived + raw data (DESTRUCTIVE)
	rm -rf $(DATA_ROOT)
