from .contact_sim import (
    ContactParams,
    ContactState,
    make_system_id_step,
    simulate,
    trajectory_loss,
)
from .system_id import (
    QCQPSystemIDParams,
    QPSystemIDParams,
    SystemID,
    qcqp_params_to_problem,
    qp_params_to_problem,
)
