"""Job plans: resumable ledger-driven execution with per-partition
lineage + metrics."""
