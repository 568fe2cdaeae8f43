from .logging import log_event, configure, StageTimer, is_primary
