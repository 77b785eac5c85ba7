"""Contract queries: scalar_fns (filled in by later milestones — see SURVEY.md §8)."""
