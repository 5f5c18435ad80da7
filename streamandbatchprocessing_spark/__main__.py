"""``python -m streamandbatchprocessing_spark`` — run the service.

Reads ``$SBP_CONFIG`` (JSON, sections mirroring the reference's
``application.conf``) when set; otherwise serves with defaults.
"""

from .service.bootstrap import serve

if __name__ == "__main__":
    serve()
