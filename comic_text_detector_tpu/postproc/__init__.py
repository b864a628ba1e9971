"""Host-side post-processing: DB polygon extraction, text-block grouping,
mask refinement."""
