"""Pipeline composition (SURVEY.md §3): every stage is DataFrame ->
DataFrame; the plan is declared once and Catalyst owns the physical
strategy."""
