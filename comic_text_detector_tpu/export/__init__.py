"""Model export: serialized StableHLO artifacts + parity checking."""

from comic_text_detector_tpu.export.stablehlo import (  # noqa: F401
    export_stablehlo,
    load_exported,
    concate_models,
    parity_check,
)
