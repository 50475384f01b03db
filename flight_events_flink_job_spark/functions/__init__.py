from .flight import (  # noqa: F401
    delay_flag,
    delay_minutes,
    hour_of_day,
    notification_json,
    route_key,
)
