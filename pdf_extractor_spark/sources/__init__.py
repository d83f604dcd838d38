"""Input sources: deterministic synthetic generators (transcripts, bank
statements) and payload-column readers with guardrails/quarantine."""
