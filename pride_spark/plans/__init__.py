"""End-to-end pipeline plans (SURVEY §3) — compositions of the operator
modules into the reference's CLI-level capabilities."""
