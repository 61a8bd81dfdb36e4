"""DataFrame→DataFrame operators (the pipeline stages of SURVEY.md §2)."""
