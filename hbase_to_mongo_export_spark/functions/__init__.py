from . import crypto, normalize, sanitise, text

__all__ = ["crypto", "normalize", "sanitise", "text"]
