"""Host utilities: image/box math, IO, logging, config."""
