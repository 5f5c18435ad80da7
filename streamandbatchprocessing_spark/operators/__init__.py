from .analytics import ANALYSES, VALID_ANALYSIS_TYPES, run_analysis

__all__ = ["ANALYSES", "VALID_ANALYSIS_TYPES", "run_analysis"]
