from .export import ExportConfig, ExportResult, build_export, run_export

__all__ = ["ExportConfig", "ExportResult", "build_export", "run_export"]
