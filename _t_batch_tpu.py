import numpy as np, time
from frenetix_tpu.io import load_scenario
from frenetix_tpu.sim import Simulation
from frenetix_tpu.utils.config import load_config
sc = load_scenario('/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml')
cfg = load_config()
cfg.simulation.start_multiagent = True
cfg.simulation.batched_device_agents = True
cfg.debug.activate_logging = False
sim = Simulation(sc, cfg)
t0=time.time(); res = sim.run()
ok = sum(s.name == 'COMPLETED_SUCCESS' for s in res.agent_status.values())
print('TPU batched: %d/6 success, steps %d, wall %.1f s, mean plan %.1f ms' % (
    ok, res.steps, time.time()-t0, 1000*np.mean(res.planning_times)), flush=True)
