"""Contract queries: llm (filled in by later milestones — see SURVEY.md §8)."""
