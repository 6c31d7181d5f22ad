# Build rituals, made mechanical. `make hooks` once per clone; then every
# builder commit runs the doc-drift gate, and `make presnapshot` is the
# full-suite gate before any end-of-round / milestone snapshot.

.PHONY: hooks presnapshot test

# Install the commit-msg doc-drift gate (git hooks are not versioned, so
# the canonical copy lives in tools/hooks/ and this target installs it).
hooks:
	install -m 0755 tools/hooks/commit-msg .git/hooks/commit-msg
	@echo "installed .git/hooks/commit-msg (DocCountsSpec gate)"

# Full-suite gate: run before ANY snapshot commit (see tools/presnapshot.sh).
presnapshot:
	tools/presnapshot.sh

test:
	sbt -batch test
