# Developer entry points. The important one:
#
#   make verify   — the pre-snapshot verification gate (run against the
#                   EXACT final tree before any end-of-round / release
#                   commit; PROGRESS.md claims must quote its output).
#
# Round 3 shipped a red multichip dryrun because the last commit added
# dryrun sections without re-running them; this gate makes that class of
# process failure mechanical to avoid.

PY ?= python

.PHONY: verify preflight smoke dryrun entry test bench

verify: smoke dryrun entry
	@echo "make verify: ALL GATES GREEN"

# Final-tree verification gate (VERDICT r04 item 4): smoke tier + the
# full multi-chip dryrun + single-chip entry compile + the headline
# bench. Run against the EXACT tree being snapshotted, as the LAST act
# of a round; paste its tail into PROGRESS.md. r03 shipped a crashed
# dryrun and r04 a timed-out one — both discovered by the driver, not
# the builder; this target makes that impossible to repeat silently.
preflight: smoke dryrun entry bench
	@echo "make preflight: ALL GATES GREEN"

# headline benchmark (one JSON line on the real chip)
bench:
	$(PY) bench.py

# sub-60s single-core liveness tier (imports every module, one fused
# jitted train step, host-side eval math)
smoke:
	$(PY) -m pytest tests/test_smoke.py -q

# full multi-chip dryrun on the virtual 8-device CPU mesh: dp x tp,
# ZeRO-1 (layout fixed-point + memory), sp, pp, composed 3D mesh —
# fail-soft per section, nonzero exit if any section failed
dryrun:
	$(PY) __graft_entry__.py 8

# single-chip compile check of the flagship forward step (the driver's
# entry() contract) on the default backend
entry:
	$(PY) -c "import jax; from __graft_entry__ import entry; \
	fn, a = entry(); jax.jit(fn).lower(*a).compile(); \
	print('entry() compile ok on', jax.devices()[0].platform)"

# default test tier (excludes the -m slow jit-heavy end-to-end tests)
test:
	$(PY) -m pytest tests/ -q

# per-round runbook-rot guard: run the full asset-gated validation
# runbook on synthetic stand-ins and archive the report (VALIDATE_r{N})
ROUND ?= dev
validate-roundtrip:
	$(PY) -m vlp3d.cli.validate --synthetic_standins /tmp/vlp3d_standins \
	  --num_points 512 --num_proposals 16 --out VALIDATE_r$(ROUND).json
