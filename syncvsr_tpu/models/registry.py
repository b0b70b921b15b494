"""Model factory: Config -> task module."""

from __future__ import annotations

from syncvsr_tpu.config import Config


def build_model(config: Config):
    task = config.model.task
    if task == "word":
        from syncvsr_tpu.models.word import WordVSRModel

        return WordVSRModel(cfg=config.model,
                            cutmix_alpha=config.data.cutmix_alpha,
                            use_cutmix=config.data.use_cutmix)
    if task == "sentence":
        from syncvsr_tpu.models.e2e import SentenceVSRModel

        return SentenceVSRModel(cfg=config.model)
    raise ValueError(f"unknown task: {task}")
