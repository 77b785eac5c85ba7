"""Contract queries: streaming_batch (filled in by later milestones — see SURVEY.md §8)."""
