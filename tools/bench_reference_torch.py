import sys, types, time, json
sys.modules['bcolz'] = types.ModuleType('bcolz')
import torch
tr = types.ModuleType('transformers'); tr.torch = torch; tr.__all__ = ['torch']
sys.modules['transformers'] = tr
sys.path.insert(0, '/root/reference')
torch.manual_seed(0)
from CaSE.Model import CaSE
V = 30522
vocab2id = {'[PAD]':0, '[unused0]':1, '[UNK]':2, '[unused1]':3}
for i in range(len(vocab2id), V):
    vocab2id[f'w{i}'] = i
id2vocab = {i: w for w, i in vocab2id.items()}
m = CaSE(4, 40, id2vocab, vocab2id, 256)
m.eval()
B = 2
data = {
 'query': torch.randint(4, V, (B,1,60)),
 'passage': torch.randint(4, V, (B,10,100)),
 'source_map': torch.randint(4, V, (B, 60+10*100)),
}
with torch.no_grad():
    t0=time.time(); out = m(dict(data), method='test'); t1=time.time()
    t2=time.time(); out = m(dict(data), method='test'); t3=time.time()
print(json.dumps({"first_s": t1-t0, "second_s": t3-t2, "batch": B,
                  "qps": B/(t3-t2)}))
