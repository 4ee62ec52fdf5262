"""Placeholder — real pipeline lands after ops/models."""


class SuperResolutionPipeline:  # pragma: no cover - replaced shortly
    pass
