from .system_id import (
    QCQPSystemIDParams,
    QPSystemIDParams,
    SystemID,
    qcqp_params_to_problem,
    qp_params_to_problem,
)
