from .generator import (
    DEFAULT_SYSTEM_PROMPT,
    GeneratorSettings,
    LLMSettings,
    RAGGenerator,
    load_system_prompt,
)

__all__ = [
    "DEFAULT_SYSTEM_PROMPT",
    "GeneratorSettings",
    "LLMSettings",
    "RAGGenerator",
    "load_system_prompt",
]
