"""Checkpoint-resumable DataFrame stages (extract -> link -> constrain ->
canonicalize -> materialize), per the north rule's stage-chain contract."""
