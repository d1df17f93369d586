"""Distributed operator library: salted joins/aggs, top-k, connected
components, dedup family, ANN. These are the hand-written patterns SURVEY.md
§4 identifies as not-Catalyst-built-in; everything else in the engine is
plain DataFrame ops."""
